package graft

import org.apache.spark.sql.functions._

import graft.similarity.Pooling

/** Embedding mean-pooling ([[graft.similarity.Pooling]]). */
class PoolingSpec extends SparkSpec {
  import spark.implicits._

  test("per-label centroids are the element-wise means, in dimension order") {
    val e = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f), 0),
      (2L, Seq(3.0f, 4.0f, 5.0f), 0),
      (3L, Seq(10.0f, 0.0f, -2.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = Pooling.meanVectors(e, "label").orderBy("label")
      .as[(Int, Long, Seq[Double])].collect().toSeq
    assert(got === Seq(
      (0, 2L, Seq(2.0, 3.0, 4.0)),
      (1, 1L, Seq(10.0, 0.0, -2.0))))
  }

  test("ragged vectors divide each dimension by its own contributor count") {
    val e = Seq(
      (1L, Seq(2.0f, 4.0f), 7),
      (2L, Seq(4.0f), 7)
    ).toDF("vec_id", "embedding", "label")
    val got = Pooling.meanVectors(e, "label")
      .as[(Int, Long, Seq[Double])].collect().toSeq
    assert(got === Seq((7, 2L, Seq(3.0, 4.0))))
  }

  test("fixture centroids are partitioning-invariant") {
    val e = Tables.load(spark, sf0001, "embeddings")
    val a = Pooling.meanVectors(e, "label").orderBy("label").collect().toSeq
    val b = Pooling.meanVectors(e.repartition(13, col("vec_id")), "label")
      .orderBy("label").collect().toSeq
    assert(a === b && a.nonEmpty)
  }
}
