package graft

import org.apache.spark.sql.functions._
import graft.analyzer.Analyzer

/** Pins the analyzer edge cases of the reference chain
  * (`prepare_data.py:22-34`, Python `str.split()` — SURVEY.md §7.4).
  */
class AnalyzerSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String): String =
    Seq(s).toDF("text").select(Analyzer.normText($"text")).as[String].first()

  private def toks(s: String): Seq[String] =
    Seq(s).toDF("text").select(Analyzer.tokens($"text")).as[Seq[String]].first()

  test("lowercases and strips punctuation to single spaces") {
    assert(norm("Hello, World! 123") === "hello world 123")
  }

  test("collapses runs of whitespace including tabs/newlines") {
    assert(norm("a\t\tb\n\n  c") === "a b c")
  }

  test("no leading/trailing empties (Python str.split parity)") {
    assert(toks("  leading and trailing  ") === Seq("leading", "and", "trailing"))
  }

  test("empty and punctuation-only strings yield zero tokens") {
    assert(toks("") === Seq.empty)
    assert(toks("!!! ... ---") === Seq.empty)
    assert(norm("!!!") === "")
  }

  test("lower-then-strip ordering is observable on uppercase input") {
    // If stripping ran before lower(), 'ABC' would be deleted.
    assert(norm("ABC def") === "abc def")
  }

  test("driver-side analyzeQuery agrees with the column analyzer") {
    val samples = Seq("Big-Data! Analytics", "  ", "Mixed CASE 42\tx", "---")
    for (s <- samples)
      assert(Analyzer.analyzeQuery(s) === toks(s), s"mismatch for '$s'")
  }

  test("tokenCount matches tokens().size") {
    val df = Seq("a b c", "", "one").toDF("text")
    val counts = df.select(Analyzer.tokenCount($"text")).as[Int].collect().toSeq
    assert(counts === Seq(3, 0, 1))
  }
}
