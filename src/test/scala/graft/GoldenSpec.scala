package graft

import org.apache.spark.sql.functions._

/** Golden regression pins: the flagship BM25 top-10 on the sf0.001
  * fixtures, as verified against the independent DuckDB oracle
  * (CORRECTNESS gate). Any analyzer/indexer/scoring drift across rounds
  * trips this before the driver does.
  */
class GoldenSpec extends SparkSpec {
  import spark.implicits._

  test("flagship BM25 top-10 matches the oracle-verified golden result") {
    val golden = Seq(
      (1L, 406L, 1.6171), (2L, 22L, 1.5927), (3L, 149L, 1.5858),
      (4L, 444L, 1.5617), (5L, 213L, 1.5524), (6L, 282L, 1.5478),
      (7L, 54L, 1.5445), (8L, 35L, 1.5441), (9L, 241L, 1.5424),
      (10L, 232L, 1.5369))
    val got = SparkEntry.queries("q_bm25_search")(spark, sf0001)
      .select($"rank", $"doc_id", $"score")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === golden)
  }

  test("corpus meta golden: 500 docs, avg_dl stable") {
    val (n, avg) = SparkEntry.queries("q_corpus_meta")(spark, sf0001)
      .as[(Long, Double)].first()
    assert(n === 500L)
    assert(math.abs(avg - 55.878) < 0.001, s"avg_dl drifted: $avg")
  }
}
