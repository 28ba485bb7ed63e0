package graft

import org.apache.spark.sql.functions._
import graft.index.Indexer
import graft.search.BM25
import graft.sources.WikiCorpus

/** End-to-end parity on the reference's own fixture corpus: 1000
  * Wikipedia articles in /root/reference/app/data, queried with the
  * reference's three smoke queries (`app/app.sh:22-27`). The reference
  * publishes no expected output (eyeball-only smoke), so these tests pin
  * OUR deterministic behavior: full ingestion, sane index stats, and
  * stable top-10s for all three queries.
  */
class ReferenceCorpusSpec extends SparkSpec {
  import spark.implicits._

  private val CorpusDir = "/root/reference/app/data"
  private lazy val corpus = WikiCorpus.read(spark, CorpusDir)
  private lazy val ix = Indexer.buildIndex(corpus)

  test("ingests all 1000 reference documents with ids and titles") {
    assert(corpus.count() === 1000)
    val sample = corpus.filter($"doc_id" === 10031136L)
      .select($"title").as[String].first()
    assert(sample === "A Decade in the Grave")
    assert(corpus.filter(length($"text") === 0).count() === 0)
  }

  test("index stats are sane on the wiki corpus") {
    val (n, avgDl) = ix.meta.select("total_docs", "avg_dl").as[(Long, Double)].first()
    assert(n === 1000)
    assert(avgDl > 100 && avgDl < 10000, s"suspicious avg_dl $avgDl")
    // df <= N; postings conserve doc length
    assert(ix.vocab.filter($"df" > n).count() === 0)
  }

  test("the three reference smoke queries return full deterministic top-10s") {
    val queries = Seq("big data analytics", "machine learning model",
      "distributed database")
    for (q <- queries) {
      val res = BM25.search(ix, q).as[(Int, Long, Double)].collect()
      assert(res.length === 10, s"'$q' returned ${res.length} rows")
      assert(res.map(_._1).toSeq === (1 to 10), s"'$q' ranks broken")
      assert(res.map(_._3).sliding(2).forall(p => p.head >= p.last - 1e-12),
        s"'$q' scores not descending")
      // run twice → identical ranking (pinned tie-break)
      val again = BM25.search(ix, q).as[(Int, Long, Double)].collect()
      assert(again.map(_._2).toSeq === res.map(_._2).toSeq, s"'$q' not stable")
    }
  }

  test("SearchCli golden smoke: tab-separated rank/doc_id/title/score, stable top-10") {
    // the CLI's testable core against the reference corpus — the same
    // lines `sbt runMain graft.SearchCli <q>` prints under
    // SPARK_GRAFT_CORPUS=/root/reference/app/data
    val cliDocs = corpus.select(col("doc_id"), col("title"), col("text"))
    for (q <- Seq("big data analytics", "machine learning model",
        "distributed database")) {
      val lines = SearchCli.run(spark, cliDocs, q)
      assert(lines.length === 10, s"'$q' printed ${lines.length} lines")
      lines.zipWithIndex.foreach { case (l, i) =>
        val parts = l.split("\t", -1)
        assert(parts.length === 4, s"'$q' line not 4 tab-separated fields: $l")
        assert(parts(0).toInt === i + 1, s"'$q' rank order broken: $l")
        parts(1).toLong // doc_id parses
        assert(parts(2).nonEmpty, s"'$q' missing title: $l")
        parts(3).toDouble // score parses
      }
      // golden stability: a re-run prints the identical ten lines
      assert(SearchCli.run(spark, cliDocs, q) === lines, s"'$q' not stable")
    }
  }

  test("top result for 'distributed database' actually contains the terms") {
    val top = BM25.search(ix, "distributed database").as[(Int, Long, Double)]
      .collect().head._2
    val text = corpus.filter($"doc_id" === top).select(lower($"text")).as[String].first()
    assert(text.contains("distributed") || text.contains("database"))
  }
}
