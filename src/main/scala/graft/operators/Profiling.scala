package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling — the "what did I just ingest" report every
  * ETL pipeline runs before trusting a new drop: per column, null count,
  * distinct count, and min/max rendered as strings so heterogeneous
  * columns share one report schema.
  *
  * Shape: a single `agg` computes 4 measures × N columns, then a
  * `stack` unpivots the 1×4N row into N report rows — one scan, one
  * aggregation, and the N-row unpivot is driver-trivial.
  *
  * Scale: `count_distinct` over several columns plans as an Expand
  * (one row per (input row, column)) feeding a single two-phase
  * aggregate — exact, but the shuffle carries every distinct value. At
  * 100 TB swap `exact = false` to profile with `approx_count_distinct`
  * (HyperLogLog++, bounded state, same one-pass shape); the gate entry
  * keeps the exact form because the oracle must hash-match.
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val aggs = cols.flatMap { c =>
      val nd = if (exact) count_distinct(col(c)) else approx_count_distinct(col(c))
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        nd.as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', ${c}__nulls, ${c}__distinct, ${c}__min, ${c}__max").mkString(", ")
    wide.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (col_name, n_nulls, n_distinct, min_val, max_val)")
  }
}
