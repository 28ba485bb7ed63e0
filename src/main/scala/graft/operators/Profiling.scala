package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling — the "what did I just ingest" report every
  * ETL pipeline runs before trusting a new drop: per column, null count,
  * distinct count, and min/max rendered as strings so heterogeneous
  * columns share one report schema.
  *
  * Shape: a single `agg` computes 4 measures × N columns, then an
  * explode-of-structs unpivots the 1×4N row into N report rows — one
  * scan, one aggregation, and the N-row unpivot is driver-trivial.
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
    // Measure aliases are INDEX-based (c0__nulls, …) so profiled column
    // names with spaces/dots/quotes stay plain data — they appear only as
    // a `lit` in the report and inside df("…") resolution, never spliced
    // into a SQL identifier position.
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      // rsd 0.02 (not the 0.05 default, a one-σ bound that misses ±5% on
      // real columns — see q_sketch_distinct): ~16 KB state per column
      val nd = if (exact) count_distinct(df(c)) else approx_count_distinct(df(c), 0.02)
      Seq(
        sum(when(df(c).isNull, 1L).otherwise(0L)).as(s"c${i}__nulls"),
        nd.as(s"c${i}__distinct"),
        min(df(c)).cast("string").as(s"c${i}__min"),
        max(df(c)).cast("string").as(s"c${i}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // Column-API unpivot: N struct rows exploded from the 1×4N aggregate.
    val rows = cols.zipWithIndex.map { case (c, i) => struct(
      lit(c).as("col_name"),
      col(s"c${i}__nulls").as("n_nulls"),
      col(s"c${i}__distinct").as("n_distinct"),
      col(s"c${i}__min").as("min_val"),
      col(s"c${i}__max").as("max_val"))
    }
    wide.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }
}
