package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the "what did I just ingest" report every ETL
  * pipeline runs before trusting a new drop: per column, null count,
  * distinct count, and min/max rendered as strings so heterogeneous
  * columns share one report schema.
  *
  * Two exactness modes, two deliberately different plan shapes:
  *
  *   - `exact = true`: ONE single-distinct aggregate per column,
  *     union'd into one action. Spark plans each branch Expand-free
  *     (`planAggregateWithOneDistinct`) and schedules the independent
  *     stages concurrently — measured 5.6 s → 0.7 s at sf0.1 local[32]
  *     versus the one-aggregate-with-N-distinct-groups form, whose
  *     Expand replicates every scan row N+1 times through the shuffle.
  *     The scan is re-read per column, but the scan was never the cost —
  *     the distinct dedup is.
  *   - `exact = false` (the 100 TB mode): one scan, one aggregate —
  *     `approx_count_distinct` (HyperLogLog++) is a plain aggregate, so
  *     all columns profile in a single Expand-free pass with bounded
  *     (~16 KB/column) state. Estimate quality is gate-verified within
  *     ±5% of exact by q_profile_approx's bounds oracle.
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    if (exact) {
      // per-column measures computed in that column's own aggregate;
      // column names never reach a SQL identifier position (they appear
      // only as a `lit` and inside df("…") resolution)
      cols.map { c =>
        df.agg(
          sum(when(df(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
          count_distinct(df(c)).as("n_distinct"),
          min(df(c)).cast("string").as("min_val"),
          max(df(c)).cast("string").as("max_val"))
          .select(lit(c).as("col_name"), col("n_nulls"), col("n_distinct"),
            col("min_val"), col("max_val"))
      }.reduce(_ union _)
    } else {
      // one-pass HLL profile; index-based aliases keep odd column names
      // out of identifier positions. rsd 0.02, not the 0.05 default —
      // a one-σ bound that misses ±5% on real columns (see
      // q_sketch_distinct).
      val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
        Seq(
          sum(when(df(c).isNull, 1L).otherwise(0L)).as(s"c${i}__nulls"),
          approx_count_distinct(df(c), 0.02).as(s"c${i}__distinct"),
          min(df(c)).cast("string").as(s"c${i}__min"),
          max(df(c)).cast("string").as(s"c${i}__max"))
      }
      val wide = df.agg(aggs.head, aggs.tail: _*)
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

  /** Pairwise Pearson correlation matrix over numeric columns — one row
    * per unordered pair `(col_a, col_b, r)` — the feature-redundancy
    * report run before training on tabular signals.
    *
    * ONE scan, ONE plain aggregate: r is derived from raw co-moments
    * (n, Σx, Σx², Σxy), so all C(k,2) pairs come out of a single
    * Expand-free pass with O(k²) scalar state — never a per-pair job
    * like `Statistics.corr` loops, never a shuffle of the data. The
    * co-moment sums use the repo-wide round-then-DECIMAL discipline:
    * partial sums are exact, so r is partition-order independent and
    * reproducible in the SQL oracle (builtin `corr`'s streaming double
    * co-moments are not).
    *
    * Index-based aliases keep column names out of identifier positions.
    */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "correlationMatrix needs at least two columns")
    val pairs = for { i <- cols.indices; j <- i + 1 until cols.size } yield (i, j)
    def dsum(c: org.apache.spark.sql.Column) =
      sum(round(c.cast("double"), 6).cast("decimal(27,6)")).cast("double")
    val aggs =
      cols.zipWithIndex.map { case (c, i) => dsum(df(c)).as(s"s$i") } ++
      cols.zipWithIndex.map { case (c, i) => dsum(df(c) * df(c)).as(s"ss$i") } ++
      pairs.map { case (i, j) => dsum(df(cols(i)) * df(cols(j))).as(s"sp${i}_$j") } :+
      count(lit(1)).cast("double").as("n")
    // The O(k²) decimal co-moment sums are CPU-bound in the map-side
    // partial agg, and a low-row-group parquet input caps scan-task
    // parallelism (the q_stats_agg note). dsum is order-independent, so
    // spreading rows first is semantically free and recovers full
    // parallelism; at real scale input splits already match cores.
    val wide = df
      .select(cols.map(df(_)): _*) // prune before the exchange
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .agg(aggs.head, aggs.tail: _*)
    // numerator/denominator shapes mirror the oracle SQL term for term:
    // identical IEEE ops on identical (exact) inputs → identical doubles
    val rows = pairs.map { case (i, j) =>
      val num = col("n") * col(s"sp${i}_$j") - col(s"s$i") * col(s"s$j")
      val den = sqrt(col("n") * col(s"ss$i") - col(s"s$i") * col(s"s$i")) *
        sqrt(col("n") * col(s"ss$j") - col(s"s$j") * col(s"s$j"))
      struct(lit(cols(i)).as("col_a"), lit(cols(j)).as("col_b"),
        round(num / den, 6).as("r"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }
}
