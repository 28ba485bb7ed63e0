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
}
