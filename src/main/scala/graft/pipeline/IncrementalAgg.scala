package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (delta-based) view maintenance for distributive
  * aggregates: the stored "view" is the PARTIAL aggregate — count and
  * exact sums are mergeable state — so refreshing after an append
  * aggregates only the delta batch and re-merges it with the bounded
  * view table. The full history is never re-read.
  *
  * This is the batch twin of a streaming Update-mode aggregation feeding
  * [[graft.streaming.UpsertSink]]: same state shape, same merge algebra,
  * chosen per SURVEY §1.4's write-once/run-both-ways rule.
  *
  * Scale: refresh cost ∝ |delta| + |view|. The view is one row per key
  * tuple (bounded by the key domain, not the corpus), the delta partial
  * is map-side combined before its one shuffle, and the merge groupBy
  * shuffles only |view| + |delta keys| rows. At 100 TB-corpus scale the
  * refresh never touches the corpus — only the appended batch.
  *
  * Determinism: counts and long sums are order-independent, so the
  * incrementally-maintained view is bit-identical to a full recompute —
  * which is exactly what the gate oracle checks.
  */
object IncrementalAgg {

  /** Partial-aggregate view of `df`: per key tuple, row count and exact
    * long sum of `sumCol`. */
  def partial(df: DataFrame, keys: Seq[String], sumCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), sum(col(sumCol)).as("sum_val"))

  /** Merge a delta partial into the stored view — the same groupBy-sum
    * algebra, over view ∪ delta (both already one row per key). */
  def merge(view: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame =
    view.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"), sum(col("sum_val")).as("sum_val"))
}
