package graft

import org.apache.spark.sql.functions._

import graft.search.PhraseSearch

class PhraseSearchSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("finds consecutive-token matches and counts occurrences") {
    val c = corpus(
      1L -> "the quick brown fox jumps",
      2L -> "quick brown dog and quick brown cat",
      3L -> "brown quick nothing here",
      4L -> "quick and brown but apart")
    val r = PhraseSearch.search(c, "quick brown", 10)
      .orderBy("rank").collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    // doc 2 has two occurrences, doc 1 one; docs 3/4 none
    assert(r.toSeq == Seq((1L, 2L, 2L), (2L, 1L, 1L)))
  }

  test("handles duplicated phrase terms") {
    val c = corpus(
      1L -> "buffalo buffalo buffalo",
      2L -> "buffalo alone",
      3L -> "x buffalo buffalo y")
    val r = PhraseSearch.search(c, "buffalo buffalo", 10)
      .collect().map(x => (x.getLong(1), x.getLong(2))).toMap
    // doc 1: starts at 0 and 1; doc 3: one start; doc 2: none
    assert(r == Map(1L -> 2L, 3L -> 1L))
  }

  test("phrase longer than any document matches nothing") {
    val c = corpus(1L -> "a b")
    assert(PhraseSearch.search(c, "a b c", 10).isEmpty)
  }

  test("respects k and ranks by phrase_tf desc then doc_id") {
    val c = corpus(
      1L -> "a b", 2L -> "a b a b", 3L -> "a b a b a b", 4L -> "a b")
    val r = PhraseSearch.search(c, "a b", 2)
      .orderBy("rank").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(r.toSeq == Seq((1L, 3L), (2L, 2L)))
  }

  test("proximitySearch matches any-order terms within the window") {
    val c = corpus(
      1L -> "hash x y slow",       // slow within 3 of hash anchor? anchor=hash@0, slow@3 → |3-0|<=3 ✓
      2L -> "slow a b c d e hash", // gap 6 > 3 ✗
      3L -> "x slow hash y",       // ✓ (reverse order near)
      4L -> "hash only here")
    val r = graft.search.PhraseSearch.proximitySearch(c, "hash slow", 3, 10)
      .orderBy("rank").collect().map(x => (x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq((1L, 1L), (3L, 1L)))
  }

  test("proximitySearch counts each qualifying anchor of the first term") {
    val c = corpus(1L -> "a b a b a")
    // anchors of "a" with a "b" within 1: positions 0,2,4 → all qualify
    val r = graft.search.PhraseSearch.proximitySearch(c, "a b", 1, 10)
      .collect().map(x => (x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq((1L, 3L)))
  }

  test("positional postings store sorted 0-based offsets") {
    val pp = graft.index.Indexer.positionalPostings(corpus(1L -> "b a b b"))
      .filter(col("term") === "b").collect()
    assert(pp.length == 1)
    assert(pp.head.getAs[scala.collection.Seq[Int]]("positions").toSeq == Seq(0, 2, 3))
    assert(pp.head.getAs[Int]("tf") == 3)
  }

  test("persisted positional store answers like the inline index, pruned at the scan") {
    import graft.search.PhraseSearch
    val docs = Tables.load(spark, sf0001, "documents")
    val path = java.nio.file.Files.createTempDirectory("posstore").toString
    graft.index.Indexer.writePositional(docs, path, nBuckets = 16)
    val inline = PhraseSearch.search(docs, "slow hash batch")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val stored = PhraseSearch.searchStore(spark, path, "slow hash batch", nBuckets = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(stored === inline)
    val plan = PhraseSearch.searchStore(spark, path, "slow hash batch", nBuckets = 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [term_bucket"),
      s"expected term_bucket partition filter in:\n$plan")
    // the proximity face of the same store
    val proxInline = PhraseSearch.proximitySearch(docs, "slow hash batch", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val proxStored = PhraseSearch.proximityStore(spark, path, "slow hash batch", 4,
        nBuckets = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(proxStored === proxInline)
  }
}
