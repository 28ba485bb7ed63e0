package graft

import graft.dedup.Dedup

class DupSpanSpec extends SparkSpec {
  import spark.implicits._

  // 12 tokens → 5 spans of n=8 (positions 1..5)
  private val shared = "one two three four five six seven eight nine ten eleven twelve"

  test("per-doc span counts: n_spans = len - n + 1; short docs excluded") {
    val df = Seq((1L, shared), (2L, "too short to have spans")).toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(df, n = 8).collect()
    assert(out.length == 1, "5-token doc has no 8-gram span and must be absent")
    assert(out.head.getLong(0) == 1L && out.head.getLong(1) == 5L)
    assert(out.head.getLong(2) == 0L, "a lone doc shares no spans")
  }

  test("spans repeated across documents are flagged in every holder") {
    // doc 2 embeds doc 1's text with a distinct prefix/suffix: every
    // span of doc 1 also occurs in doc 2
    val df = Seq(
      (1L, shared),
      (2L, "zzz prefix " + shared + " suffix yyy"),
      (3L, "wholly unrelated words that appear nowhere else in this corpus ok")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(df, n = 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((5L, 5L)), s"all of doc 1's spans are shared: ${out(1L)}")
    val (n2, dup2) = out(2L)
    assert(n2 == 9L && dup2 == 5L, s"doc 2 shares exactly doc 1's 5 spans: ($n2, $dup2)")
    assert(out(3L)._2 == 0L, "unrelated doc has no duplicated span")
  }

  test("spanClean removes exactly the covered tokens, everywhere") {
    val df = Seq(
      (1L, shared),
      (2L, "zzz prefix " + shared + " suffix yyy"),
      (3L, "wholly unrelated words that appear nowhere else in this corpus ok"),
      (4L, "short doc")
    ).toDF("doc_id", "text")
    val out = Dedup.spanClean(df, n = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // doc 1 is entirely covered by duplicated windows → emptied
    assert(out(1L) == ((12L, 12L, "")), s"doc 1: ${out(1L)}")
    // doc 2 loses the 12 embedded tokens; its unique prefix/suffix survive
    assert(out(2L) == ((16L, 12L, "zzz prefix suffix yyy")), s"doc 2: ${out(2L)}")
    // untouched docs reassemble verbatim (normalized)
    assert(out(3L)._2 == 0L &&
      out(3L)._3 == "wholly unrelated words that appear nowhere else in this corpus ok")
    // below-n docs pass through whole
    assert(out(4L) == ((2L, 0L, "short doc")), s"doc 4: ${out(4L)}")
  }

  test("dup_frac is the duplicated share of span positions") {
    val df = Seq((1L, shared), (2L, shared)).toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(df, n = 8).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getLong(2) == r.getLong(1), "identical docs duplicate every span")
      assert(r.getDouble(3) == 1.0)
    }
  }
}
