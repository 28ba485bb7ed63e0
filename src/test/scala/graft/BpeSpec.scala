package graft

import org.apache.spark.sql.functions._

import graft.text.Bpe

/** BPE vocabulary training ([[graft.text.Bpe]]) on corpora small enough
  * to run the merge algorithm by hand. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("learns the most frequent pair first, with deterministic tie-break") {
    // "low low low lower" — pairs: (l,o)x4, (o,w)x4, (w,e)x1, (e,r)x1.
    // Tie (l,o) vs (o,w) at 4 breaks on pair_left asc -> (l,o) first.
    val m = Bpe.learnMerges(corpus("low low low lower"), 2)
    assert(m.map(x => (x.pair_left, x.pair_right, x.freq)) ===
      Seq(("l", "o", 4L), ("lo", "w", 4L)))
    assert(m.map(_.merged) === Seq("lo", "low"))
  }

  test("greedy left-to-right merging on overlapping runs (aaaa, aaa)") {
    // word "aaaa" x3, "aaa" x2. Step 1: pair (a,a) freq = 3*3 + 2*2 = 13.
    // Greedy: "aaaa" -> [aa][aa], "aaa" -> [aa][a].
    // Step 2 pairs: (aa,aa) x3, (aa,a) x2 -> top (aa,aa) freq 3.
    val docs = corpus("aaaa aaaa aaaa aaa aaa")
    val m = Bpe.learnMerges(docs, 2)
    assert(m.map(x => (x.pair_left, x.pair_right, x.freq)) ===
      Seq(("a", "a", 13L), ("aa", "aa", 3L)))
  }

  test("segmentUnitCounts applies merges per word, never across words") {
    // learn on "ab ab ab": merge1 (a,b)->ab. Segmenting "ab ab" must give
    // 2 units (one per word), not 1 (no cross-word merge); "cab" -> c,ab
    // is WRONG under word-internal greedy? No: chars c,a,b -> pair (a,b)
    // merges -> [c, ab] = 2 units.
    val learned = Bpe.learnMerges(corpus("ab ab ab"), 1)
    assert(learned.map(_.merged) === Seq("ab"))
    val seg = Bpe.segmentUnitCounts(corpus("ab ab", "cab", "xyz", ""), learned)
      .orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    assert(seg === Seq(2L, 2L, 3L, 0L))
  }

  test("multi-char symbols never false-match as prefixes") {
    // After merging (a,b)->ab, a later pair (x,a) must not match inside
    // " x ab " (symbol ab starts with a). Corpus: "xab" x3 "xa" x1.
    // Step 1: pairs (x,a) 4, (a,b) 3 -> merge (x,a)->xa.
    // Step 2: "xab" now [xa, b] -> pair (xa,b) 3; "xa" -> [xa] no pair.
    val m = Bpe.learnMerges(corpus("xab xab xab xa"), 2)
    assert(m.map(x => (x.pair_left, x.pair_right, x.freq)) ===
      Seq(("x", "a", 4L), ("xa", "b", 3L)))
  }

  test("merge table on the fixture corpus is stable across partitionings") {
    val d = Tables.load(spark, sf0001, "documents")
    val a = Bpe.learnMerges(d, 3)
    val b = Bpe.learnMerges(d.repartition(7, col("doc_id")), 3)
    assert(a === b)
    assert(a.size === 3)
    // merges are learned in non-increasing frequency order
    assert(a.sliding(2).forall { case Seq(x, y) => x.freq >= y.freq })
  }
}
