package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins, composed from
  * primitives it optimizes well (preference order (a) of the design
  * brief — no custom physical plan needed).
  *
  * Scale design:
  *   - [[asofJoin]] is the union/last-value formulation: one shuffle on
  *     the key, one per-key sort — O((|L|+|R|) log) with NO pairwise
  *     blowup, the standard distributed as-of algorithm (what a
  *     sort-merge AsofJoinExec would do internally).
  *   - [[rangeJoin]] buckets time into `window`-sized cells and joins
  *     each left row to its own and the adjacent cell — candidate volume
  *     O(pairs within 2 buckets) instead of the O(n²) cross join a naive
  *     inequality join plans. AQE handles per-bucket skew.
  */
object TemporalJoins {

  /** For each left row, attach the right row's `valueCols` from the
    * latest right row with `right.ts <= left.ts` on the same `key`
    * (inclusive, matching DuckDB/pandas ASOF semantics). Left rows with
    * no prior right row keep nulls.
    *
    * `leftCols` are carried through; right value columns are emitted as
    * `asof_<name>`.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               valueCols: Seq[String]): DataFrame = {
    val lCols: Seq[Column] =
      Seq(col(key).as("__k"), col(ts).as("__ts"), lit(1).as("__tag")) ++
        left.columns.map(c => col(c)) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__v_$c"))
    val rCols: Seq[Column] =
      Seq(col(key).as("__k"), col(ts).as("__ts"), lit(0).as("__tag")) ++
        left.columns.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(c => col(c).as(s"__v_$c"))
    // right rows (tag 0) sort before left rows at equal ts → inclusive
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val outCols: Seq[Column] =
      Seq(col("__tag")) ++ left.columns.map(col) ++
        valueCols.map(c => last(col(s"__v_$c"), ignoreNulls = true).over(w)
          .as(s"asof_$c"))
    left.select(lCols: _*).unionByName(right.select(rCols: _*))
      .select(outCols: _*)
      .filter(col("__tag") === 1).drop("__tag")
  }

  /** All pairs of rows within `windowSec` seconds of each other on the
    * same `key` (strictly `a.ts < b.ts`, gap ≤ windowSec): bucketed
    * band join. Output: key, a/b id and ts columns, gap in seconds.
    */
  def rangeJoin(df: DataFrame, key: String, ts: String, idCol: String,
                windowSec: Long): DataFrame = {
    val bucketed = df.select(col(key).as("k"), col(idCol).as("id"),
        col(ts).as("t"), (col(ts).cast("long") / windowSec).cast("long").as("b"))
    val a = bucketed.toDF("k", "id_a", "t_a", "b")
    // each left row probes its own bucket and the next (a<b ⇒ b's bucket
    // is ≥ a's; gap ≤ window ⇒ at most one bucket ahead)
    val probes = a.withColumn("b", explode(array(col("b"), col("b") + 1)))
    val b = bucketed.toDF("k", "id_b", "t_b", "b")
    probes.join(b, Seq("k", "b"))
      .filter(col("t_a") < col("t_b") &&
        col("t_b").cast("double") - col("t_a").cast("double") <= windowSec)
      .select(col("k").as(key), col("id_a"), col("id_b"),
        (col("t_b").cast("double") - col("t_a").cast("double")).as("gap_s"))
      .distinct()
  }
}
