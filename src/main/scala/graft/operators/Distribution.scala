package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-shape operators: robust outlier flagging and equi-depth
  * histograms — the data-quality passes a training pipeline runs before
  * trusting a numeric column (reward values, loss spikes, document
  * lengths).
  *
  * Both are built on Spark's exact `percentile` aggregate (two-phase,
  * bounded state per group) rather than global sorts or windows:
  * no single-partition WindowExec, no full-order shuffle — the only
  * exchanges are group-keyed aggregates plus a broadcast of the
  * (tiny) per-group statistics back onto the rows.
  */
object Distribution {

  /** Robust z-score outliers per group: a row is an outlier when
    * |value − median| > `cut` · 1.4826 · MAD (1.4826 scales the median
    * absolute deviation to σ under normality — the standard robust
    * estimator, immune to the outliers it hunts, unlike mean/stddev).
    * Returns the flagged rows: `(group, id, value, rz)`.
    *
    * Two aggregate passes by construction (MAD needs the median first);
    * each is a group-keyed exact percentile, joined back broadcast-style
    * (|groups| rows).
    */
  def robustOutliers(df: DataFrame, groupCol: String, idCol: String,
                     valCol: String, cut: Double = 3.0): DataFrame = {
    val med = df.groupBy(groupCol)
      .agg(expr(s"percentile($valCol, 0.5)").as("med"))
    val withMed = df.select(col(groupCol), col(idCol), col(valCol))
      .join(broadcast(med), groupCol)
    val mad = withMed.groupBy(groupCol)
      .agg(expr(s"percentile(abs($valCol - med), 0.5)").as("mad"))
    withMed.join(broadcast(mad), groupCol)
      .withColumn("rz", (col(valCol) - col("med")) / (lit(1.4826) * col("mad")))
      .filter(abs(col("rz")) > cut)
      .select(col(groupCol), col(idCol), col(valCol), round(col("rz"), 6).as("rz"))
  }

  /** Winsorization: clip `valCol` to its group's [lo, hi] exact
    * percentiles — the standard heavy-tail taming pass before computing
    * means/losses that a single spike would otherwise own. Returns all
    * rows with `clipped` (and the original value) so downstream aggs
    * can run on either. Cutpoints rounded to 6 dp before comparison
    * (same engine-reproducibility rule as [[equiDepthHistogram]]).
    * One group-keyed percentile agg + a broadcast join back — no sort,
    * no window.
    */
  def winsorize(df: DataFrame, groupCol: String, idCol: String, valCol: String,
                lo: Double = 0.01, hi: Double = 0.99): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"need 0 <= lo < hi <= 1, got ($lo, $hi)")
    val cuts = df.groupBy(groupCol).agg(
      round(expr(s"percentile($valCol, $lo)"), 6).as("p_lo"),
      round(expr(s"percentile($valCol, $hi)"), 6).as("p_hi"))
    df.select(col(groupCol), col(idCol), col(valCol))
      .join(broadcast(cuts), groupCol)
      .withColumn("clipped",
        when(col(valCol) < col("p_lo"), col("p_lo"))
          .when(col(valCol) > col("p_hi"), col("p_hi"))
          .otherwise(col(valCol)))
      .select(col(groupCol), col(idCol), col(valCol), col("clipped"))
  }

  /** Equi-depth histogram: `nBuckets` buckets holding ~equal row counts,
    * with exact interpolated percentile cutpoints. Returns
    * `(bucket, n, lo, hi)` — bucket i covers values in
    * (cut_{i-1}, cut_i], bucket 0 opens at −∞.
    *
    * Cutpoints are rounded to 6 decimals BEFORE the bucket comparison so
    * the assignment is reproducible across engines (an unrounded
    * interpolated cutpoint can differ in the last ulp and flip a row
    * sitting exactly on the edge).
    */
  def equiDepthHistogram(df: DataFrame, valCol: String, nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val ps = (1 until nBuckets).map(i => i.toDouble / nBuckets)
    val cuts = df.agg(
      expr(s"transform(percentile($valCol, array(${ps.mkString(", ")})), c -> round(c, 6))")
        .as("cuts"))
    df.select(col(valCol)).crossJoin(broadcast(cuts))
      .select(col(valCol),
        // bucket = number of cutpoints strictly below the value
        size(filter(col("cuts"), c => c < col(valCol))).cast("long").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        round(min(col(valCol)), 6).as("lo"),
        round(max(col(valCol)), 6).as("hi"))
  }
}
