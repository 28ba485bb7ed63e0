package graft

import org.apache.spark.sql.functions._

import graft.search.{HybridRetrieval, SparseSim}

/** Reciprocal-rank fusion ([[graft.search.HybridRetrieval]]) and TF-IDF
  * keyword extraction ([[graft.search.SparseSim.keywords]]). */
class HybridRetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def ranking(rows: (Long, Long, Long)*) =
    rows.toSeq.toDF("query_id", "doc_id", "rank")

  test("rrfFuse: hand-computed fusion on a tiny fixture") {
    val a = ranking((1L, 10L, 1L), (1L, 11L, 2L))
    val b = ranking((1L, 11L, 1L), (1L, 12L, 2L))
    val got = HybridRetrieval.rrfFuse(Seq("a" -> a, "b" -> b), k = 10)
      .orderBy(col("rank"))
      .select("doc_id", "rrf", "a_rank", "b_rank", "rank")
      .collect()
    // doc 11: 1/62 + 1/61 ≈ 0.032522; doc 10: 1/61 ≈ 0.016393; doc 12: 1/62
    assert(got.map(_.getLong(0)).toSeq === Seq(11L, 10L, 12L))
    assert(got(0).getDouble(1) === 0.032522)
    assert(got(1).getDouble(1) === 0.016393)
    assert(got(0).getLong(2) === 2L && got(0).getLong(3) === 1L) // per-list ranks
    assert(got(1).isNullAt(3), "doc 10 absent from list b → null b_rank")
  }

  test("rrfFuse: a doc in both lists outranks equally-placed single-list docs") {
    val a = ranking((1L, 10L, 1L), (1L, 20L, 2L))
    val b = ranking((1L, 30L, 1L), (1L, 20L, 2L))
    val top = HybridRetrieval.rrfFuse(Seq("a" -> a, "b" -> b), k = 1)
      .select("doc_id").as[Long].head()
    assert(top === 20L, "consensus doc must win over two rank-1 singletons")
  }

  test("rrfFuse rejects duplicate labels") {
    val a = ranking((1L, 10L, 1L))
    intercept[IllegalArgumentException] {
      HybridRetrieval.rrfFuse(Seq("x" -> a, "x" -> a), k = 5)
    }
  }

  test("tfidfTopKStore serves the live view of a tombstoned store") {
    // regression (r7): the TF-IDF store face used to read the raw
    // postings, returning (and scoring against) soft-deleted docs
    val docs = Tables.load(spark, sf0001, "documents")
    val path = java.nio.file.Files.createTempDirectory("tfidfdel").toString
    graft.index.Indexer.writeIndex(graft.index.Indexer.buildIndex(docs), path,
      nBuckets = 16)
    graft.index.Indexer.deleteDocs(spark, path,
      docs.filter(col("doc_id") % 3 === 0).select("doc_id"))
    val stored = SparseSim.tfidfTopKStore(spark, path, Seq(1L, 2L), 5)
      .as[(Long, Long, Double, Long)].collect().toSeq.sortBy(r => (r._1, r._4))
    val fresh = SparseSim.tfidfTopK(docs.filter(col("doc_id") % 3 =!= 0),
        Seq(1L, 2L), 5)
      .as[(Long, Long, Double, Long)].collect().toSeq.sortBy(r => (r._1, r._4))
    assert(stored === fresh,
      "tombstoned store must answer like a fresh index on the live docs")
    assert(stored.nonEmpty && stored.forall(_._2 % 3 != 0))
  }

  test("keywords: exactly n per doc, ranked by weight then term") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val kw = SparseSim.keywords(docs, n = 3).cache()
    val perDoc = kw.groupBy("doc_id").agg(count(lit(1)).as("n"),
      max(col("rank")).as("maxr"))
    assert(perDoc.filter(col("n") =!= 3 || col("maxr") =!= 3).isEmpty,
      "every fixture doc has >= 3 distinct terms, so exactly 3 keywords")
    // rank order follows (w desc, term asc) within each doc
    val bad = kw.as[(Long, String, Double, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val s = it.toSeq.sortBy(_._4)
        s.zip(s.tail).filter { case (hi, lo) =>
          hi._3 < lo._3 || (hi._3 == lo._3 && hi._2 > lo._2)
        }
      }
    assert(bad.isEmpty, "keyword ranks out of (w desc, term asc) order")
    kw.unpersist()
  }
}
