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
}
