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

  test("searchMany answers each phrase exactly like the single-phrase face") {
    // fixture corpus + toy docs so the duplicated-term phrase has matches
    val docs = Tables.load(spark, sf0001, "documents").select("doc_id", "text")
      .unionByName(Seq(990001L -> "buffalo buffalo buffalo",
        990002L -> "x buffalo buffalo y").toDF("doc_id", "text"))
    val pp = graft.index.Indexer.positionalPostings(docs)
    val log = Seq(
      1L -> "slow hash batch",
      2L -> "slow hash",
      3L -> "buffalo buffalo",  // duplicated phrase term
      4L -> "",                 // zero tokens → no rows
      5L -> "zebra stripes qq") // no match → no rows
    val many = PhraseSearch.searchMany(pp, log.toDF("query_id", "phrase"))
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    assert(!many.contains(4L) && !many.contains(5L))
    assert(many.contains(3L), "dup-term phrase must match the toy docs")
    log.filter { case (id, _) => many.contains(id) }.foreach { case (id, phrase) =>
      val single = PhraseSearch.searchPostings(pp, phrase)
        .as[(Long, Long, Long)].collect().toSeq
      assert(many(id).map(r => (r._2, r._3, r._4)) === single,
        s"phrase $id diverged")
    }

    // proximity batch face vs single face
    val plog = Seq(1L -> "slow hash batch", 2L -> "batch slow")
    val pmany = PhraseSearch.proximityMany(pp, plog.toDF("query_id", "phrase"), 4)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    plog.foreach { case (id, q) =>
      val single = PhraseSearch.proximitySearch(docs, q, 4)
        .as[(Long, Long, Long)].collect().toSeq
      assert(pmany.getOrElse(id, Seq.empty).map(r => (r._2, r._3, r._4)) === single,
        s"proximity $id diverged")
    }

    // store faces: identical answers through the pruned live scan, and
    // tombstoned docs vanish from every query
    val path = java.nio.file.Files.createTempDirectory("posbatch").toString
    graft.index.Indexer.writeIndex(graft.index.Indexer.buildIndex(docs), path, nBuckets = 16)
    graft.index.Indexer.writePositional(docs, path, nBuckets = 16)
    val viaStore = PhraseSearch.searchStoreMany(spark, path,
        log.toDF("query_id", "phrase"), nBuckets = 16)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    assert(viaStore.keySet === many.keySet)
    many.foreach { case (id, rows) => assert(viaStore(id) === rows, s"store $id") }
    val deadTop = many(3L).head._3 // the dup-term query's toy top doc
    graft.index.Indexer.deleteDocs(spark, path, Seq(deadTop).toDF("doc_id"))
    val afterDelete = PhraseSearch.searchStoreMany(spark, path,
        log.toDF("query_id", "phrase"), nBuckets = 16)
      .as[(Long, Long, Long, Long)].collect()
    assert(!afterDelete.exists(_._3 == deadTop),
      "tombstoned doc must vanish from every phrase query")
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
