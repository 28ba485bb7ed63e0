package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.analyzer.Analyzer

/** Windowed term co-occurrence with PMI scoring — the corpus-statistics
  * operator behind collocation mining, query expansion, and word-vector
  * preprocessing (the PMI matrix is the input to SVD-style embeddings).
  *
  * A co-occurrence event is an unordered term pair (a, b) whose token
  * offsets in the same document differ by 1..`window`. PMI compares the
  * observed pair rate against the independence assumption:
  *
  *   pmi(a,b) = ln( (n_ab / P) / ((n_a / T) · (n_b / T)) )
  *
  * with n_ab the pair's event count, P total events, n_x unigram
  * occurrence counts, T total tokens. All counts are exact integers, so
  * the score is a single `ln` of a rational — deterministic across
  * engines at the gate's 6-decimal rounding.
  *
  * Scale (100 TB): the pair generator is an EQUI-join, not a range
  * join — each token emits `window` probe keys `(doc_id, pos+o)` and
  * joins on exact position, so the shuffle carries window·|tokens| rows
  * and no nested-loop ever appears. Marginals join back on `term`
  * (vocabulary-keyed exchange); the two global scalars ride along as a
  * broadcast 1-row frame. min-count pruning happens before the marginal
  * joins, cutting the long tail (most pairs are rare) early.
  */
object Cooccurrence {

  /** Pairs with `n_ab >= minCount`:
    * `(term_a, term_b, n_ab, pmi)`, term_a <= term_b lexicographically. */
  def pmiPairs(corpus: DataFrame, window: Int = 3, minCount: Long = 5,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val tok = corpus
      .select(col(idCol).as("doc_id"),
        posexplode(Analyzer.tokens(col(textCol))).as(Seq("pos", "term")))
    val probes = tok.select(col("doc_id"),
      explode(sequence(col("pos") + 1, col("pos") + window)).as("pos"),
      col("term").as("t_left"))
    val events = probes.join(tok, Seq("doc_id", "pos"))
      .select(least(col("t_left"), col("term")).as("term_a"),
        greatest(col("t_left"), col("term")).as("term_b"))
    val pairCounts = events.groupBy("term_a", "term_b")
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    val unigrams = tok.groupBy("term").agg(count(lit(1)).as("n"))
    // two global scalars as a broadcast 1-row frame — no driver collect
    val totals = broadcast(
      tok.agg(count(lit(1)).as("t_total"))
        .crossJoin(events.agg(count(lit(1)).as("p_total"))))
    pairCounts
      .join(unigrams.select(col("term").as("term_a"), col("n").as("n_a")), "term_a")
      .join(unigrams.select(col("term").as("term_b"), col("n").as("n_b")), "term_b")
      .crossJoin(totals)
      .select(col("term_a"), col("term_b"), col("n_ab"),
        // multiply as doubles (a long product of three counts overflows
        // ANSI at corpus scale); factor order mirrored in the oracle so
        // the IEEE result is bit-identical
        round(log(
          (col("n_ab").cast("double") * col("t_total").cast("double") * col("t_total").cast("double")) /
            (col("p_total").cast("double") * col("n_a").cast("double") * col("n_b").cast("double"))), 6).as("pmi"))
  }
}
