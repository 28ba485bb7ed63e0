package graft

import org.apache.spark.sql.functions._
import graft.similarity.Similarity

class IvfSpec extends SparkSpec {
  import spark.implicits._

  test("ivfTopK: candidates scored identically to brute force; ranks well-formed") {
    val e = Tables.load(spark, sf0001, "embeddings")
    val q = e.filter($"vec_id".isin(0L, 1L, 2L))
    val brute = Similarity.bruteForceTopK(e, q, 1000)
      .as[(Long, Long, Double, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val ivf = Similarity.ivfTopK(e, q, 10).as[(Long, Long, Double, Long)].collect()
    assert(ivf.nonEmpty)
    ivf.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq === (1L to rows.length)) // contiguous ranks
    }
    ivf.foreach { r =>
      assert(math.abs(brute((r._1, r._2)) - r._3) < 1e-12) // exact same scoring
    }
  }

  test("ivfTopK with nProbe = nCentroids degenerates to brute force") {
    val e = Tables.load(spark, sf0001, "embeddings").limit(100)
    val q = e.filter($"vec_id" === 0L)
    val full = Similarity.ivfTopK(e, q, 5, nCentroids = 8, nProbe = 8)
      .as[(Long, Long, Double, Long)].collect().map(r => (r._4, r._2)).toSet
    val brute = Similarity.bruteForceTopK(e, q, 5)
      .as[(Long, Long, Double, Long)].collect().map(r => (r._1 == 0L, r._4, r._2))
      .map(r => (r._2, r._3)).toSet
    assert(full === brute)
  }
}
