package graft

import org.apache.spark.sql.functions._
import graft.index.Indexer

/** Hand-computed micro-corpus pinning TF/DF/doc-length/meta semantics
  * (reference MR jobs 1+2 — SURVEY.md §2.4 A1–A5).
  */
class IndexerSpec extends SparkSpec {
  import spark.implicits._

  // 3 docs + 1 empty; token counts computable by hand.
  private lazy val corpus = Seq(
    (1L, "the quick brown fox the fox"),   // 6 tokens; the:2 fox:2 quick:1 brown:1
    (2L, "The quick, quick dog!"),         // 4 tokens; the:1 quick:2 dog:1
    (3L, "lazy dog"),                      // 2 tokens
    (4L, "")                               // 0 tokens
  ).toDF("doc_id", "text")

  private lazy val ix = Indexer.buildIndex(corpus)

  test("docStats counts tokens per document, including empty docs") {
    val m = ix.docStats.as[(Long, Int)].collect().toMap
    assert(m === Map(1L -> 6, 2L -> 4, 3L -> 2, 4L -> 0))
  }

  test("postings hold per-(term,doc) frequencies") {
    val m = ix.postings.as[(String, Long, Int)].collect()
      .map { case (t, d, tf) => (t, d) -> tf }.toMap
    assert(m(("the", 1L)) === 2)
    assert(m(("fox", 1L)) === 2)
    assert(m(("quick", 2L)) === 2)
    assert(m(("the", 2L)) === 1)
    assert(m(("dog", 3L)) === 1)
    assert(m.size === 9) // the@1,quick@1,brown@1,fox@1, the@2,quick@2,dog@2, lazy@3,dog@3
  }

  test("vocab counts distinct docs per term") {
    val m = ix.vocab.as[(String, Long)].collect().toMap
    assert(m === Map("the" -> 2, "quick" -> 2, "brown" -> 1, "fox" -> 1,
      "dog" -> 2, "lazy" -> 1))
  }

  test("meta: total_docs counts all docs; avg_dl averages over all docs") {
    val (n, avg, lsum) = ix.meta.select("total_docs", "avg_dl", "length_sum")
      .as[(Long, Double, Long)].first()
    assert(n === 4)
    assert(math.abs(avg - 3.0) < 1e-12) // (6+4+2+0)/4
    assert(lsum === 12L) // the exact mergeable sum behind avg_dl
  }

  test("sum of tf per doc equals doc length (conservation property)") {
    val sums = ix.postings.groupBy("doc_id").agg(sum("tf").as("s"))
    val joined = ix.docStats.join(sums, Seq("doc_id"), "left")
      .select($"length", coalesce($"s", lit(0)).cast("int"))
      .as[(Int, Int)].collect()
    joined.foreach { case (len, s) => assert(len === s) }
  }

  test("df never exceeds total_docs") {
    val n = ix.meta.select($"total_docs").as[Long].first()
    assert(ix.vocab.filter($"df" > n).count() === 0)
  }
}
