package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation: compare an approximate top-k list
  * against the exact one, per query. ANN indexes (sign-LSH, IVF) trade
  * recall for candidate volume — "measure, don't guess" means the recall
  * curve itself should be a first-class, verifiable query, not a code
  * comment. (At 100 TB you tune `nPlanes`/`nProbe` by running THIS over
  * a query sample, never by full brute force.)
  *
  * Scale: both inputs are already-ranked top-k frames (≤ |queries|·k
  * rows); the comparison is one equi-join on (query_id, vec_id) and a
  * per-query count — negligible next to either retrieval.
  */
object Eval {

  /** Per-query recall@k of `approx` against `exact` — both shaped
    * `(query_id, vec_id, ...)` with ≤ k rows per query (the output shape
    * of [[Similarity.bruteForceTopK]] and friends). Returns
    * `(query_id, n_exact, n_hit, recall)`; queries present in `exact`
    * but absent from `approx` score 0. */
  def recallAtK(exact: DataFrame, approx: DataFrame): DataFrame = {
    val hits = exact.select("query_id", "vec_id")
      .join(approx.select(col("query_id"), col("vec_id"), lit(1L).as("hit")),
        Seq("query_id", "vec_id"), "left_outer")
    hits.groupBy("query_id")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .select(col("query_id"), col("n_exact"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_exact").cast("double"), 6).as("recall"))
  }

  /** Per-query reciprocal rank of `approx` against `exact` — the MRR
    * building block beside [[recallAtK]] (did we find ANY of the truth,
    * and how high?). A query's score is `1/r` for the smallest approx
    * rank `r ≤ k` whose item appears in the exact list, 0 when none
    * does; `first_hit_rank` reports that rank (0 = miss). Mean over
    * queries = MRR@k, left to the caller — per-query rows are the
    * verifiable unit. Same bounded-frame posture as [[recallAtK]]:
    * one equi-join on (query_id, vec_id) over ≤ |queries|·k rows. */
  def reciprocalRank(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    val firstHit = approx.filter(col("rank") <= k)
      .join(exact.select(col("query_id"), col("vec_id"), lit(1).as("rel")),
        Seq("query_id", "vec_id"))
      .groupBy("query_id").agg(min(col("rank")).as("fr"))
    exact.select("query_id").distinct()
      .join(firstHit, Seq("query_id"), "left_outer")
      .select(col("query_id"),
        coalesce(col("fr"), lit(0L)).cast("long").as("first_hit_rank"),
        round(when(col("fr").isNull, lit(0.0))
          .otherwise(lit(1.0) / col("fr")), 6).as("rr"))
  }

  /** Rank-position discount 1/log₂(r+1) as a PRE-COMPUTED literal table.
    * Both engines then use bit-identical double constants — computing
    * log2 at query time would expose libm-vs-StrictMath last-ulp
    * differences to the hash compare. */
  def dcgWeight(rank: Int): Double = 1.0 / (math.log(rank + 1.0) / math.log(2.0))

  /** NDCG@k of `approx` against `exact` — both `(query_id, vec_id,
    * rank)`, graded gain = the exact list's 6-dp `rel` (0 for items
    * outside it). `dcg = Σ round(gain·w_rank, 9)` summed as DECIMAL
    * (order-independent), `idcg` likewise over the exact list, output
    * `round(dcg/idcg, 6)`. Same bounded-frame scale posture as
    * [[recallAtK]].
    */
  def ndcgAtK(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    val w = (1 to k).map(r => r -> dcgWeight(r)).toMap
    def weight(rankCol: org.apache.spark.sql.Column) =
      (1 to k).foldLeft(lit(0.0)) { (acc, r) =>
        when(rankCol === r, lit(w(r))).otherwise(acc)
      }
    def dsum9(e: org.apache.spark.sql.Column) =
      sum(round(e, 9).cast("decimal(25,9)")).cast("double")
    val gains = exact.select(col("query_id"), col("vec_id"), col("rel"))
    val dcg = approx.filter(col("rank") <= k)
      .join(gains, Seq("query_id", "vec_id"), "left_outer")
      .groupBy("query_id")
      .agg(dsum9(coalesce(col("rel"), lit(0.0)) * weight(col("rank"))).as("dcg"))
    val idcg = exact.filter(col("rank") <= k)
      .groupBy("query_id")
      .agg(dsum9(col("rel") * weight(col("rank"))).as("idcg"))
    idcg.join(dcg, Seq("query_id"), "left_outer")
      .select(col("query_id"),
        round(coalesce(col("dcg"), lit(0.0)) / col("idcg"), 6).as("ndcg"))
  }
}
