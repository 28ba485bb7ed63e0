package graft

import graft.index.Indexer
import graft.search.BM25

/** BM25 scores on a corpus small enough to hand-compute
  * (reference formula `app/query.py:60-81`, k1=1.2, b=0.75).
  */
class BM25Spec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "apple banana apple"),  // len 3
    (2L, "apple cherry"),        // len 2
    (3L, "durian durian durian") // len 3
  ).toDF("doc_id", "text")

  private lazy val ix = Indexer.buildIndex(corpus)

  // Reference BM25, straight port of query.py:74-81 for the expected side.
  private def bm25(tf: Int, df: Long, dl: Int, n: Long, avgDl: Double,
                   k1: Double = 1.2, b: Double = 0.75): Double = {
    val idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgDl))
  }

  test("single-term query scores and ranks by hand-computed BM25") {
    val res = BM25.search(ix, "apple").as[(Int, Long, Double)].collect()
    val n = 3L; val avg = 8.0 / 3
    val exp1 = bm25(tf = 2, df = 2, dl = 3, n, avg)
    val exp2 = bm25(tf = 1, df = 2, dl = 2, n, avg)
    assert(res.map(_._2).toSeq === Seq(1L, 2L).sortBy(id => -(if (id == 1) exp1 else exp2)))
    val byDoc = res.map(r => r._2 -> r._3).toMap
    assert(math.abs(byDoc(1L) - exp1) < 1e-12)
    assert(math.abs(byDoc(2L) - exp2) < 1e-12)
    assert(res.map(_._1).toSeq === Seq(1, 2)) // ranks
  }

  test("multi-term query sums partial scores per doc") {
    val res = BM25.search(ix, "apple cherry").as[(Int, Long, Double)].collect()
    val n = 3L; val avg = 8.0 / 3
    val expected2 = bm25(1, 2, 2, n, avg) + bm25(1, 1, 2, n, avg)
    val byDoc = res.map(r => r._2 -> r._3).toMap
    assert(math.abs(byDoc(2L) - expected2) < 1e-12)
    assert(byDoc.keySet === Set(1L, 2L))
  }

  test("terms absent from the corpus contribute nothing; empty query → empty") {
    assert(BM25.search(ix, "unseen words only").count() === 0)
    assert(BM25.search(ix, "!!! ...").count() === 0)
    val withNoise = BM25.search(ix, "durian zzzz").as[(Int, Long, Double)].collect()
    assert(withNoise.map(_._2).toSeq === Seq(3L))
  }

  test("duplicate query terms count once (isin semantics, query.py:25-43)") {
    val once  = BM25.search(ix, "apple").as[(Int, Long, Double)].collect().map(r => r._2 -> r._3).toMap
    val twice = BM25.search(ix, "apple apple").as[(Int, Long, Double)].collect().map(r => r._2 -> r._3).toMap
    assert(once === twice)
  }

  test("topK and deterministic tie-break (score desc, doc_id asc)") {
    val res = BM25.search(ix, "apple cherry durian", BM25.Params(topK = 2))
    assert(res.count() === 2)
  }

  test("score is monotone in tf, anti-monotone in df (property)") {
    val n = 100L; val avg = 10.0
    assert(bm25(3, 5, 10, n, avg) > bm25(2, 5, 10, n, avg))
    assert(bm25(2, 5, 10, n, avg) > bm25(2, 50, 10, n, avg))
  }

  test("flagship end-to-end on sf0.001 documents returns top-10") {
    val docs = Tables.load(spark, sf0001, "documents")
    val res = BM25.search(Indexer.buildIndex(docs), "fast hash join scan")
    val rows = res.as[(Int, Long, Double)].collect()
    assert(rows.length === 10)
    // ranks are 1..10 and scores non-increasing
    assert(rows.map(_._1).toSeq === (1 to 10))
    assert(rows.map(_._3).sliding(2).forall(p => p.head >= p.last - 1e-12))
  }

  test("searchMany answers each query exactly like the single-query face") {
    val docs = Tables.load(spark, sf0001, "documents")
    val bigIx = Indexer.buildIndex(docs, titleCol = Some("source"))
    val log = Seq(
      1L -> "fast hash join scan",
      2L -> "slow hash batch",
      3L -> "",                   // normalizes to no tokens → no rows
      4L -> "zzzznotaterm qqq",   // no postings match → no rows
      5L -> "fast zzzznotaterm"   // partial match scores the known term only
    )
    val many = BM25.searchMany(bigIx, log.toDF("query_id", "query_text"))
      .as[(Long, Int, Long, String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    assert(!many.contains(3L) && !many.contains(4L))
    log.filter { case (id, _) => many.contains(id) }.foreach { case (id, text) =>
      val single = BM25.search(bigIx, text)
        .as[(Int, Long, String, Double)].collect().toSeq
      val got = many(id)
      assert(got.map(r => (r._2, r._3, r._4)) ===
        single.map(r => (r._1, r._2, r._3)), s"query $id ranking diverged")
      got.zip(single).foreach { case (m, s) =>
        assert(math.abs(m._5 - s._4) < 1e-9, s"query $id score diverged")
      }
    }
    // per-query top-k bounds each group independently
    val bounded = BM25.searchMany(bigIx, log.toDF("query_id", "query_text"),
      BM25.Params(topK = 3))
      .groupBy("query_id").count().as[(Long, Long)].collect().toMap
    assert(bounded.values.forall(_ <= 3L), bounded.toString)

    // the store-backed face answers identically through the pruned scan,
    // and keeps excluding tombstoned docs
    val path = java.nio.file.Files.createTempDirectory("bm25batchstore").toString
    Indexer.writeIndex(bigIx, path, nBuckets = 16)
    val viaStore = BM25.searchManyStore(spark, path,
        log.toDF("query_id", "query_text"), nBuckets = 16)
      .as[(Long, Int, Long, String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    assert(viaStore.keySet === many.keySet)
    many.foreach { case (id, rows) =>
      assert(viaStore(id).map(r => (r._2, r._3)) === rows.map(r => (r._2, r._3)),
        s"query $id store ranking diverged")
    }
    val deadTop = many(1L).head._3 // tombstone query 1's top doc
    Indexer.deleteDocs(spark, path,
      Seq(deadTop).toDF("doc_id"))
    val afterDelete = BM25.searchManyStore(spark, path,
        log.toDF("query_id", "query_text"), nBuckets = 16)
      .as[(Long, Int, Long, String, Double)].collect()
    assert(!afterDelete.exists(r => r._3 == deadTop),
      "tombstoned doc must vanish from every query's results")
  }

  test("searchManyStore evaluates the query frame ONCE (pruning and join agree)") {
    // The pruned store path has two consumers of the analyzed query
    // frame: the bucket-union collect and the scoring join. If each
    // re-evaluated the frame, a nondeterministic query source (sample,
    // rand-derived ids) could give the collect one set of terms and the
    // join another — pruning away matching postings. The contract: ONE
    // materialization (eager localCheckpoint), observed here by counting
    // UDF evaluations of the query text.
    val docs = Tables.load(spark, sf0001, "documents")
    val path = java.nio.file.Files.createTempDirectory("bm25onceeval").toString
    Indexer.writeIndex(Indexer.buildIndex(docs), path, nBuckets = 16)
    QueryEvalProbe.evals.set(0L)
    import org.apache.spark.sql.functions.{col, udf}
    val probed = udf { s: String => QueryEvalProbe.evals.incrementAndGet(); s }
    val log = Seq(1L -> "fast hash join scan", 2L -> "slow hash batch")
      .toDF("query_id", "raw")
      .select(col("query_id"), probed(col("raw")).as("query_text"))
    val res = BM25.searchManyStore(spark, path, log, nBuckets = 16).collect()
    assert(res.nonEmpty)
    assert(QueryEvalProbe.evals.get() === 2L,
      s"query frame evaluated ${QueryEvalProbe.evals.get()} row-times for a " +
        "2-query log — the bucket collect and the scoring join must share " +
        "one materialization")
  }
}

/** Executor-visible (same-JVM in local mode) evaluation counter for the
  * single-materialization contract test. */
object QueryEvalProbe {
  val evals = new java.util.concurrent.atomic.AtomicLong(0L)
}
