package graft

import org.apache.spark.sql.functions._

import graft.similarity.Quantize

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("toInt8 codes stay in [-127,127] and reconstruct within scale/2") {
    val e = Seq(
      (1L, Seq(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Seq(-2.0f, 2.0f, 1.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val q = Quantize.toInt8(e)
    val codes = q.select(explode(col("qvec"))).as[Long].collect()
    assert(codes.forall(c => c >= -127 && c <= 127))
    val joined = Quantize.fromInt8(q)
      .join(e.withColumnRenamed("vec_id", "id"), "id")
      .select(col("id"), col("vec"), col("embedding"))
      .collect()
    joined.foreach { r =>
      val rec = r.getAs[scala.collection.Seq[Double]]("vec")
      val orig = r.getAs[scala.collection.Seq[Float]]("embedding")
      val scale = orig.map(v => math.abs(v.toDouble)).max / 127.0
      rec.zip(orig).foreach { case (a, b) =>
        assert(math.abs(a - b) <= scale / 2 + 1e-6, s"row ${r.getLong(0)}: $a vs $b")
      }
    }
  }

  test("toInt8 handles the zero vector") {
    val e = Seq((1L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = Quantize.toInt8(e).collect().head
    assert(r.getDouble(1) == 0.0)
    assert(r.getAs[scala.collection.Seq[Long]]("qvec").toSeq == Seq(0L, 0L))
  }

  test("max-magnitude component maps to ±127 exactly") {
    val e = Seq((1L, Seq(0.5f, -1.0f))).toDF("vec_id", "embedding")
    val r = Quantize.toInt8(e).collect().head
    val qv = r.getAs[scala.collection.Seq[Long]]("qvec").toSeq
    assert(qv(1) == -127L)
  }

  test("tiny magnitudes stay clamped to [-127,127] despite scale round-down") {
    // max|v| = 1.2e-5 → scale rounds 9.448...e-8 down to 9.4e-8, and
    // round(1.2e-5 / 9.4e-8) = 128 without the clamp — the byte-cast
    // overflow ADVICE r5 flagged. Clamp must hold and the byte cast
    // must survive ANSI mode.
    val e = Seq(
      (1L, Seq(1.2e-5f, -1.2e-5f, 6.0e-6f)),
      (2L, Seq(1.0e-7f, -3.0e-8f, 0.0f)))
      .toDF("vec_id", "embedding")
    val q = Quantize.toInt8(e)
    val codes = q.select(explode(col("qvec"))).as[Long].collect()
    assert(codes.forall(c => c >= -127 && c <= 127), codes.toSeq.toString)
    // the downstream byte cast (IvfStore.writeIndexQuantized) must not throw
    val bytes = q.select(transform(col("qvec"), x => x.cast("byte")).as("b"))
      .selectExpr("explode(b)").as[Byte].collect()
    assert(bytes.forall(b => b >= -127 && b <= 127))
  }
}
