package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared report shape for the store integrity checkers ("fsck") —
  * [[graft.index.Indexer.checkStore]], [[graft.similarity.IvfStore.checkStore]],
  * [[graft.dedup.DedupStore.checkStore]]: one row per invariant,
  * `(invariant: string, checked: long, violations: long)`, all-zero
  * `violations` on a healthy store. Checks absent by design report
  * `checked = 0` instead of dropping the row, so every checker's report
  * schema is stable for monitoring.
  */
object StoreCheck {

  /** Normalize a 1-row aggregate carrying `checked`/`violations` into a
    * report row. Null aggregates (sums over empty tables) coalesce to 0. */
  def row(name: String, agg: DataFrame): DataFrame =
    agg.select(lit(name).as("invariant"),
      coalesce(col("checked"), lit(0L)).cast("long").as("checked"),
      coalesce(col("violations"), lit(0L)).cast("long").as("violations"))

  /** Report row for a check that does not apply to this store. */
  def emptyRow(spark: SparkSession, name: String): DataFrame =
    spark.range(1).select(lit(name).as("invariant"),
      lit(0L).as("checked"), lit(0L).as("violations"))

  /** Assemble the final report: union the per-invariant rows, ordered by
    * invariant name for deterministic output. */
  def report(rows: Seq[DataFrame]): DataFrame =
    rows.reduce(_.unionByName(_)).orderBy("invariant")

  /** Force the report NOW and return it as a small local frame. The deep
    * checkers cache their audited tables so every invariant reads ONE
    * shared materialization instead of re-scanning the store per check
    * (a deep audit at 100 TB is priced per pass over the big tables);
    * the cache can only be released once the report rows are computed,
    * so a lazily-returned report would either leak the cache or re-scan
    * at every later evaluation. The report is ≤ a dozen rows — bounded
    * driver metadata by design — and an eager report is also what the
    * detect→repair compositions want: a lazy frame would silently
    * re-audit the REPAIRED store when evaluated after the repair. */
  def materialize(spark: SparkSession, report: DataFrame): DataFrame = {
    val rows = report.collect()
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), report.schema)
  }
}
