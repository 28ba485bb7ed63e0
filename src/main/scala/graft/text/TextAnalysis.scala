package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.analyzer.Analyzer

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All scalar
  * column expressions — per-row, no shuffle, fuse into the corpus scan.
  */
object TextAnalysis {

  /** Marker-word lists for the n-gram/stopword language heuristic.
    * Deterministic and tiny — they compile into literal arrays. */
  val DefaultMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es" -> Seq("el", "los", "y", "es", "que", "una", "por"),
    "fr" -> Seq("le", "les", "et", "est", "que", "une", "dans"))

  /** Count of tokens contained in `words`. */
  def markerHits(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => array_contains(array(words.map(lit): _*), t)))

  /** Predicted language: argmax of marker hits, ties resolved by marker
    * list order (first listed wins); zero hits → "und". */
  def langId(textCol: Column, markers: Seq[(String, Seq[String])] = DefaultMarkers): Column = {
    val toks = Analyzer.tokens(textCol)
    val hits = markers.map { case (lang, words) => lang -> markerHits(toks, words) }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = hits.foldRight(lit("und")) { case ((lang, h), acc) =>
      when(h === best && best > 0, lit(lang)).otherwise(acc)
    }
    // foldRight gives priority to the FIRST matching language on ties.
    pick
  }

  /** Whitespace token count (the reference's doc length) — ws_tokens —
    * and a BPE-ish unit count: alpha runs count 1 each, every digit 1,
    * every other non-space symbol 1. */
  val BpeishPattern = "[a-z]+|[0-9]|[^a-z0-9\\s]"

  def bpeishCount(textCol: Column): Column =
    regexp_count(lower(textCol), lit(BpeishPattern))

  /** Quality-score feature bundle. Components:
    *   - n_tokens, avg_token_len (exact int arithmetic / count)
    *   - alnum_ratio: fraction of non-space chars that are alphanumeric
    *   - stopword_ratio: marker-word hits / tokens (fluent text has some)
    *   - score: 0.4·min(n_tokens/100,1) + 0.3·alnum_ratio + 0.3·min(4·stop,1)
    */
  def qualityFeatures(df: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val txt = lower(col(textCol))
    val toks = Analyzer.tokens(col(textCol))
    val allMarkers = DefaultMarkers.flatMap(_._2).distinct
    val nTokens = size(toks)
    val sumLen = aggregate(transform(toks, t => length(t)), lit(0), (acc, x) => acc + x)
    val nonSpace = length(regexp_replace(txt, "\\s", ""))
    val alnum = length(regexp_replace(txt, "[^a-z0-9]", ""))
    val stop = markerHits(toks, allMarkers)
    df.select(
      col(idCol).as("doc_id"),
      nTokens.cast("long").as("n_tokens"),
      when(nTokens > 0, sumLen.cast("double") / nTokens).otherwise(lit(0.0)).as("avg_token_len"),
      when(nonSpace > 0, alnum.cast("double") / nonSpace).otherwise(lit(0.0)).as("alnum_ratio"),
      when(nTokens > 0, stop.cast("double") / nTokens).otherwise(lit(0.0)).as("stopword_ratio"))
      .withColumn("quality_score",
        lit(0.4) * least(col("n_tokens").cast("double") / 100.0, lit(1.0)) +
          lit(0.3) * col("alnum_ratio") +
          lit(0.3) * least(lit(4.0) * col("stopword_ratio"), lit(1.0)))
  }

  /** Corpus-bigram language-model score per document — the
    * perplexity-filtering signal: docs whose word transitions are
    * improbable under the corpus's own bigram statistics (gibberish,
    * boilerplate soup, wrong-language fragments) score low.
    *
    * score = avg over the doc's bigrams of ln(c(w1,w2) / c(w1,·)),
    * i.e. the mean log conditional probability. Both counts come from
    * the corpus itself, so every doc bigram has c ≥ 1 — no smoothing
    * needed, and the ratio is a ratio of exact integers. Per-bigram logs
    * are rounded then DECIMAL-summed so the mean is partition-order
    * independent (the float-determinism discipline of the oracle gate).
    *
    * Scale: one bigram explode (narrow), one (w1,w2) count aggregate,
    * one (w1) count aggregate, one shuffle join of doc bigrams with the
    * count tables on their natural keys, one per-doc aggregate. Counts
    * tables are |vocab²-observed| rows — far smaller than the corpus.
    */
  def bigramLmScore(df: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      Analyzer.tokens(col(textCol)).as("toks"))
    val bigrams = toks.filter(size(col("toks")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("toks")) - 2),
          i => struct(element_at(col("toks"), i + 1).as("w1"),
            element_at(col("toks"), i + 2).as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1"), col("bg.w2"))
    val c12 = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = bigrams.groupBy("w1").agg(count(lit(1)).as("c1"))
    bigrams
      .join(c12, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .select(col("doc_id"),
        round(log(col("c12").cast("double") / col("c1")), 6)
          .cast("decimal(25,6)").as("lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("lp")).cast("double") / count(lit(1))).as("lm_score"))
  }

  /** Rule-based quality filter with per-rule accounting: every document
    * gets a `fail_reason` (the FIRST failing rule, "ok" if none) and a
    * `kept` flag — the funnel report a filtering pipeline needs to
    * attribute data loss to specific rules, not just count survivors.
    * Thresholds are corpus-tuned parameters; rule ORDER is part of the
    * contract (first match wins, like a CASE).
    */
  def qualityFilter(df: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text",
                    minTokens: Int = 25, maxAvgTokenLen: Double = 4.7,
                    minStopwordRatio: Double = 0.05): DataFrame =
    qualityFeatures(df, idCol, textCol)
      .withColumn("fail_reason",
        when(col("n_tokens") < minTokens, "too_short")
          .when(col("avg_token_len") > maxAvgTokenLen, "long_tokens")
          .when(col("stopword_ratio") < minStopwordRatio, "low_stopword")
          .otherwise("ok"))
      .withColumn("kept", (col("fail_reason") === "ok").cast("long"))
      .select("doc_id", "kept", "fail_reason")

  /** PII-ish patterns (training-data scrubbing): deliberately simple
    * character-class regexes that mean the same thing in Java regex
    * (Spark) and RE2 (DuckDB), so the scan is oracle-verifiable. A
    * production scrubber would layer real validators behind the same
    * column API. Applied to lowercased text. */
  val EmailPattern = "[a-z0-9._]+@[a-z0-9.]+[a-z]"
  val UrlPattern   = "https?://[a-z0-9./_-]+"
  val PhonePattern = "[0-9][0-9-]{6,}[0-9]"

  /** Per-document PII hit counts `(emails, urls, phones)`. */
  def piiCounts(textCol: Column): (Column, Column, Column) = {
    val t = lower(textCol)
    (regexp_count(t, lit(EmailPattern)),
      regexp_count(t, lit(UrlPattern)),
      regexp_count(t, lit(PhonePattern)))
  }

  /** Redacted text: URLs first (they contain digits/dots that the other
    * patterns could partially match), then emails, then number runs —
    * the same order the oracle applies. */
  def redactPii(textCol: Column): Column = {
    val noUrl   = regexp_replace(lower(textCol), UrlPattern, "<URL>")
    val noEmail = regexp_replace(noUrl, EmailPattern, "<EMAIL>")
    regexp_replace(noEmail, PhonePattern, "<NUM>")
  }

  /** Per-document repetition signal: most-frequent word trigram count
    * over total trigrams — boilerplate/spam detector
    * (`rep_ratio → 1` ⇒ the doc is one phrase repeated). Shuffle keyed on
    * (doc_id, trigram), partial-aggregated map-side.
    */
  def repetition(df: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      Analyzer.tokens(col(textCol)).as("toks"))
    val tri = toks.filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(0), size(col("toks")) - 3),
          i => concat_ws(" ", element_at(col("toks"), i + 1),
            element_at(col("toks"), i + 2), element_at(col("toks"), i + 3))))
          .as("tri"))
    tri.groupBy("doc_id", "tri").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_tri"), max(col("c")).as("max_tri"))
      .select(col("doc_id"), col("n_tri"), col("max_tri"),
        (col("max_tri").cast("double") / col("n_tri")).as("rep_ratio"))
  }

  /** Character-distribution entropy — the classic gibberish/binary-blob
    * detector: Shannon entropy (bits) of the letter histogram of the
    * lowercased text. Natural-language text sits near 4–4.2 bits;
    * key-mash, base64 soup and single-char spam fall far outside.
    *
    * Letter counts come from [[org.apache.spark.sql.graft.CharHistogram]]
    * — ONE codegen'd pass over the lowered text fills all 26 bins
    * (byte-wise, which equals the code-point count: see its scaladoc) —
    * replacing the 26 `length - length(translate)` re-scans this used to
    * cost. The DuckDB oracle keeps the translate formulation; per-bin
    * values are identical integers, and the entropy add chain stays in
    * 'a'..'z' left-fold order on both engines, so the double sum is
    * bit-stable; the gate rounds to 6 dp to absorb cross-engine `log2`
    * ulp differences. Scale: scalar projection fused into the scan, no
    * shuffle.
    *
    * Returns (n_letters, letter_ratio, entropy).
    */
  def charEntropy(textCol: Column): (Column, Column, Column) = {
    val t = lower(textCol)
    val hist = org.apache.spark.sql.graft.CharHistogram.charHist(t)
    // element_at is codegen'd and `hist` is deterministic, so subexpression
    // elimination computes the histogram once per row; the adds below run
    // over 26 longs, not 26 string walks.
    val counts = (1 to 26).map(i => element_at(hist, i))
    val total = counts.reduce(_ + _)
    val totD = total.cast("double")
    val terms = counts.map { n =>
      val p = n.cast("double") / totD
      when(n > 0, -p * log2(p)).otherwise(lit(0.0))
    }
    val entropy = when(total > 0, terms.reduce(_ + _)).otherwise(lit(0.0))
    val ratio = when(length(t) > 0, totD / length(t).cast("double")).otherwise(lit(0.0))
    (total, ratio, entropy)
  }

  /** Order-sensitive rolling-hash document fingerprint over tokens:
    * fold (acc·31 + code(t)) mod 1e9+7, seeded with the first token's
    * code (DuckDB `list_reduce` fold shape); code(t) = ascii(t)·131 + len(t).
    * Empty docs → 0.
    */
  def fingerprint(textCol: Column): Column = {
    val codes = transform(Analyzer.tokens(textCol),
      t => (ascii(t) * lit(131L) + length(t)))
    when(size(codes) === 0, lit(0L))
      .otherwise(aggregate(
        slice(codes, lit(2), greatest(size(codes) - 1, lit(0))),
        element_at(codes, 1).cast("long"),
        (acc, x) => pmod(acc * 31L + x, lit(1000000007L))))
  }
}
