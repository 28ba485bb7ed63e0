package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift detection via the Population Stability Index:
  *
  *   PSI = Σ_buckets (p_b − q_b) · ln(p_b / q_b)
  *
  * between a reference slice and a comparison slice of the same
  * numeric column — the standard "did my feature distribution move"
  * monitor run between training drops. Rule of thumb: < 0.1 stable,
  * 0.1–0.25 drifting, > 0.25 broken.
  *
  * Buckets are fixed-width (caller-chosen width — percentile-based
  * bucketing is [[Distribution.equiDepthHistogram]]'s job); buckets
  * where either side is empty are excluded (ln(0) — the standard
  * finite-sample convention; at scale add a smoothing count if empty
  * buckets carry signal). All shares are exact integer ratios, the
  * per-bucket contribution is rounded then DECIMAL-summed, so the
  * index is partition-order independent and oracle-reproducible.
  *
  * Plan: two filtered aggregates over one scan shape (group keys:
  * (group, bucket)), joined on the bucket domain, one final
  * group-keyed sum — no window, no broadcast of data.
  */
object Drift {

  /** Per-group PSI of `valCol` between `refFilter` rows and
    * `cmpFilter` rows: `(group, n_buckets_compared, psi)`.
    *
    * `manyGroups = false` (default) computes the per-group totals with a
    * window over the bucket-count frame — one exchange, right for
    * monitoring reports over few groups. With a HIGH-cardinality group
    * key a single window partition per group serializes each group's
    * buckets through one task; `manyGroups = true` swaps it for a
    * groupBy + equi-join on the (tiny, |groups|-row) totals frame —
    * same exact integer totals, identical output (spec-verified), plan
    * shaped for the many-group case. */
  def psi(df: DataFrame, groupCol: String, valCol: String,
          refFilter: org.apache.spark.sql.Column,
          cmpFilter: org.apache.spark.sql.Column,
          bucketWidth: Double, manyGroups: Boolean = false): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    def side(f: org.apache.spark.sql.Column, n: String, t: String) = {
      val counts = df.filter(f)
        .select(col(groupCol).as("grp"),
          floor(col(valCol) / lit(bucketWidth)).cast("long").as("bucket"))
        .groupBy("grp", "bucket").agg(count(lit(1)).as(n))
      if (manyGroups)
        counts.join(counts.groupBy("grp").agg(sum(col(n)).as(t)), Seq("grp"))
      else
        counts.withColumn(t, sum(col(n)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))))
    }
    // Bucket-count frames are |groups|·|buckets| rows in either mode.
    val ref = side(refFilter, "n_ref", "t_ref")
    val cmp = side(cmpFilter, "n_cmp", "t_cmp")
    ref.join(cmp, Seq("grp", "bucket")) // inner: both sides nonzero
      .select(col("grp"), col("bucket"),
        (col("n_ref").cast("double") / col("t_ref").cast("double")).as("p"),
        (col("n_cmp").cast("double") / col("t_cmp").cast("double")).as("q"))
      .groupBy(col("grp").as(groupCol))
      .agg(count(lit(1)).as("n_buckets_compared"),
        round(sum(round((col("p") - col("q")) * log(col("p") / col("q")), 9)
          .cast("decimal(25,9)")).cast("double"), 6).as("psi"))
  }
}
