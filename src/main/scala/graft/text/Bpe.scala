package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analyzer.Analyzer

/** Byte-pair-encoding vocabulary training — the tokenizer-learning step of
  * an LLM data pipeline (the reference stops at whitespace tokens,
  * `mapreduce/mapper1.py:14`; BPE is the modern continuation of that
  * surface: learn subword merges from corpus statistics).
  *
  * Formulation is the standard word-count one (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units"): pair
  * frequencies are computed over the WORD VOCABULARY weighted by word
  * counts, never over the raw corpus — after the one corpus-wide
  * word-count aggregate (two-phase, map-side combined), every training
  * iteration touches only the vocabulary table, whose size is sublinear
  * in corpus size (Heaps' law). That is exactly how production BPE
  * trainers scale to 100 TB corpora: the corpus is read once.
  *
  * Symbol sequences are kept as single-space-separated strings
  * (`" a b c "` for the word `abc`) rather than arrays, so a merge step
  * is two literal `replace` calls (codegen'd string ops, no lambda):
  * replacing `" l r "` with `" lr "` left-to-right merges the 1st, 3rd,
  * 5th… occurrence of any run of adjacent candidates (the trailing space
  * of one match is the leading space the next occurrence needed), and a
  * second identical `replace` merges the survivors — which are never
  * adjacent to each other. Two passes therefore reproduce greedy
  * left-to-right BPE merging exactly; symbols are analyzer tokens'
  * substrings (`[a-z0-9]+`), so the space delimiter can never collide.
  *
  * Per-iteration driver state is ONE row (the argmax pair) — the same
  * bounded-metadata pattern as the IVF probed-centroid collect
  * (`IvfStore.scala`); iterations `localCheckpoint` the small vocabulary
  * table so the plan stays O(1) in the merge count (as in
  * [[graft.operators.Graph.pageRank]]).
  */
object Bpe {

  /** One learned merge: at `step`, `pair_left`+`pair_right` → `merged`,
    * which occurred `freq` times (weighted by word counts). */
  case class Merge(step: Int, pair_left: String, pair_right: String,
                   merged: String, freq: Long)

  /** `(word, cnt)` over analyzer tokens — the one corpus-wide pass. */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(Analyzer.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** `"abc"` → `" a b c "`: leading space + each char followed by one
    * space — every adjacent symbol pair `(l, r)` appears as `" l r "`
    * with full delimiters on both sides. */
  private[graft] def charRepr(w: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(lit(" "), regexp_replace(w, "(.)", "$1 "))

  /** Adjacent-pair frequencies over `(repr, cnt)` rows:
    * `(pair_left, pair_right, freq)`. */
  private[graft] def pairCounts(words: DataFrame): DataFrame =
    words
      .select(col("cnt"),
        filter(split(col("repr"), " "), t => t =!= "").as("s"))
      .select(col("cnt"),
        explode(expr("transform(slice(s, 1, size(s) - 1), (x, i) -> struct(x AS l, s[i + 1] AS r))")).as("p"))
      .groupBy(col("p.l").as("pair_left"), col("p.r").as("pair_right"))
      .agg(sum(col("cnt")).as("freq"))

  /** Apply one merge to a repr column: two literal replaces (see class
    * doc for why two passes are exact greedy merging). */
  private def applyMerge(repr: org.apache.spark.sql.Column,
                         l: String, r: String): org.apache.spark.sql.Column = {
    val pat = lit(s" $l $r "); val rep = lit(s" $l$r ")
    replace(replace(repr, pat, rep), pat, rep)
  }

  /** Learn `nMerges` merges from the corpus. Returns the merge table in
    * learning order; ties on frequency break on (pair_left, pair_right)
    * ascending so the result is engine-portable. */
  def learnMerges(docs: DataFrame, nMerges: Int,
                  textCol: String = "text"): Seq[Merge] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    var words = wordCounts(docs, textCol)
      .select(col("word"), col("cnt"), charRepr(col("word")).as("repr"))
      .localCheckpoint(true) // corpus is read ONCE; iterations see only the vocab
    val merges = Seq.newBuilder[Merge]
    for (step <- 1 to nMerges) {
      val top = pairCounts(words)
        .orderBy(col("freq").desc, col("pair_left").asc, col("pair_right").asc)
        .limit(1).collect() // bounded driver metadata: one argmax row
      if (top.nonEmpty) {
        val (l, r, f) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(step, l, r, l + r, f)
        words = words.withColumn("repr", applyMerge(col("repr"), l, r))
          .localCheckpoint(true)
      }
    }
    merges.result()
  }

  /** The learned merge table as a DataFrame (gate surface). */
  def merges(spark: SparkSession, docs: DataFrame, nMerges: Int): DataFrame = {
    import spark.implicits._
    learnMerges(docs, nMerges).toDF()
      .select(col("step").cast("long"), col("pair_left"), col("pair_right"),
        col("merged"), col("freq"))
  }

  /** Segment every document with a learned merge list and report the
    * resulting subword-unit count per doc — the "how much did the
    * tokenizer compress" report. Documents are rendered as one symbol
    * string with DOUBLE spaces between words, so single-space merge
    * patterns can never fire across a word boundary. */
  def segmentUnitCounts(docs: DataFrame, merges: Seq[Merge],
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val docRepr = concat(lit(" "),
      array_join(transform(Analyzer.tokens(col(textCol)),
        w => regexp_replace(w, "(.)", "$1 ")), " "),
      lit(" "))
    val merged = merges.foldLeft(docRepr) { (c, m) =>
      applyMerge(c, m.pair_left, m.pair_right)
    }
    docs.select(col(idCol),
      size(filter(split(merged, " "), t => t =!= "")).cast("long").as("n_units"))
  }
}
