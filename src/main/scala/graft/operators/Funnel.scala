package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-step funnel analysis over an event log — the sequential-pattern
  * operator behind conversion reporting: for an ordered list of step
  * event types (e.g. view → click → purchase), each user's earliest
  * strictly-ordered completion time per step. Step k's time is the
  * user's earliest event of type `steps(k)` AFTER their step-(k−1) time
  * — the canonical earliest-qualifying-event semantics, and greedy
  * earliest is optimal (taking the earliest prior step time never
  * excludes a later completion).
  *
  * Scale: one filtered aggregate per step plus an equi-join per step,
  * all hash-partitioned on the user key; the join input carries ONE row
  * per user reaching the previous step. No per-user event sequence is
  * ever materialized (the collect_list/sort funnel formulation buffers
  * whole user histories per task — unbounded per-key state at 100 TB;
  * this shape's per-key state is one timestamp per step).
  */
object Funnel {

  /** Per-user funnel completion times: `(user, t1 .. tN)`, tK null once
    * the user fails to reach step K. Input rows not matching any step
    * type are pruned at the scan (the filters push down). */
  def funnelTimes(events: DataFrame, steps: Seq[String],
                  userCol: String = "user_id", typeCol: String = "event_type",
                  tsCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    steps.tail.zipWithIndex.foldLeft(first) { case (acc, (step, i)) =>
      val k = i + 2
      val stepEvents = events.filter(col(typeCol) === step)
        .select(col(userCol), col(tsCol).as("__ts"))
      val reached = acc.select(col(userCol), col(s"t${k - 1}"))
        .join(stepEvents, Seq(userCol))
        .filter(col("__ts") > col(s"t${k - 1}"))
        .groupBy(col(userCol)).agg(min(col("__ts")).as(s"t$k"))
      acc.join(reached, Seq(userCol), "left_outer")
    }
  }

  /** Step-level conversion report: users reaching each step and the
    * conversion rate vs step 1 — the summary a dashboard consumes. */
  def funnelReport(events: DataFrame, steps: Seq[String],
                   userCol: String = "user_id", typeCol: String = "event_type",
                   tsCol: String = "ts"): DataFrame = {
    val times = funnelTimes(events, steps, userCol, typeCol, tsCol)
    val aggExprs = count(lit(1)).as("c1") +: steps.indices.tail.map(i =>
      count(col(s"t${i + 1}")).as(s"c${i + 1}"))
    val counts = times.agg(aggExprs.head, aggExprs.tail: _*)
    val rows = steps.zipWithIndex.map { case (step, i) => struct(
      lit(i + 1).cast("long").as("step"),
      lit(step).as("step_type"),
      col(s"c${i + 1}").as("n_users"),
      (col(s"c${i + 1}").cast("double") / col("c1")).as("conversion"))
    }
    counts.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }
}
