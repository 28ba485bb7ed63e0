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
