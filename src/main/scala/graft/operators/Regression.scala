package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group ordinary-least-squares line fit from closed-form
  * co-moments — the trend detector run over metric streams (is this
  * group's value drifting up?) without MLlib weight, iteration, or
  * nondeterminism:
  *
  *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
  *   intercept = (Σy − slope·Σx) / n
  *
  * One scan, one group-keyed aggregate (bounded state: 5 sums), the
  * same round-then-DECIMAL exact-sum discipline as
  * [[Profiling.correlationMatrix]] — co-moments are partition-order
  * independent, so the fit is bit-reproducible and oracle-verifiable.
  *
  * Precision contract: the caller scales x into a range where
  * `round(x², 6)` fits DECIMAL(27,6) sums (|x| ≲ 1e7 at 1e6 rows) —
  * e.g. days-since-epoch-start rather than raw epoch seconds.
  */
object Regression {

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(round(c, 6).cast("decimal(27,6)")).cast("double")

  /** `(group, n, slope, intercept)` — groups with zero x-variance get
    * null slope/intercept (vertical line). */
  def linearFit(df: DataFrame, groupCol: String, xCol: String,
                yCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val m = df.groupBy(groupCol).agg(
      count(lit(1)).cast("double").as("n"),
      dsum(x).as("sx"), dsum(y).as("sy"),
      dsum(x * x).as("sxx"), dsum(x * y).as("sxy"))
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) / den
    m.select(col(groupCol), col("n").cast("long").as("n"),
      round(when(den === 0.0, lit(null)).otherwise(slope), 6).as("slope"),
      round(when(den === 0.0, lit(null))
        .otherwise((col("sy") - slope * col("sx")) / col("n")), 6).as("intercept"))
  }
}
