// Placed under org.apache.spark.sql to reach private[sql] surfaces
// (classic.Dataset.ofRows) — the standard extension technique for
// shipping whole custom operators outside Spark.
package org.apache.spark.sql.graft

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Top-k-per-key as a first-class operator: for every group defined by
  * `keyExprs`, keep the first `k` rows under `order` — the semantics of
  * `row_number() OVER (PARTITION BY … ORDER BY …) <= k`, executed with
  * bounded per-key heaps instead of a full sort of every group.
  *
  * Why a custom physical operator (SURVEY.md §2 tier-(c)): the window
  * formulation materializes and SORTS every row of every group after
  * shuffling ALL of them; at 100 TB with k=3 that is almost entirely
  * wasted work. This operator runs partial+final like an aggregate:
  *
  * {{{
  *   TopKPerKeyExec(final)    — merge per-key heaps, emit ≤ k rows/key
  *     +- Exchange hashpartitioning(keys)   [inserted by EnsureRequirements]
  *        +- TopKPerKeyExec(partial)        — map-side heaps: ≤ k rows
  *                                            per key LEAVE each task
  * }}}
  *
  * so the exchange carries at most k·keys-per-partition rows, not the
  * table. State per task is keys-in-partition × k row copies — the same
  * bound a partial HashAggregate lives with.
  *
  * `order` must be a total order (add a unique tiebreaker) for
  * deterministic results — the same contract the window form has.
  */
case class TopKPerKey(keyExprs: Seq[Expression], order: Seq[SortOrder], k: Int,
                      child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

/** Plans [[TopKPerKey]] as partial → (exchange) → final. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      val partial = TopKPerKeyExec(keys, order, k, partial = true, planLater(child))
      TopKPerKeyExec(keys, order, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keyExprs: Seq[Expression], order: Seq[SortOrder], k: Int,
                          partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning

  // The partial phase runs wherever the data is; the final phase needs
  // all rows of a key co-located — EnsureRequirements inserts the hash
  // exchange (which then carries only the partials' ≤ k rows per key).
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution) else Seq(ClusteredDistribution(keyExprs))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyE = keyExprs
    val orderE = order
    val childOutput = child.output
    val kk = k
    child.execute().mapPartitionsInternal { iter =>
      val keyProj = UnsafeProjection.create(keyE, childOutput)
      // BaseOrdering is an Ordering[InternalRow]; PriorityQueue dequeues
      // the LARGEST under it, i.e. the current worst of the kept k — the
      // one to evict when a better row arrives.
      implicit val ord: Ordering[InternalRow] = RowOrdering.create(orderE, childOutput)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(pq) =>
            if (pq.size < kk) pq.enqueue(row.copy())
            else if (ord.compare(row, pq.head) < 0) { pq.dequeue(); pq.enqueue(row.copy()) }
          case None =>
            val pq = mutable.PriorityQueue.empty[InternalRow]
            pq.enqueue(row.copy())
            heaps.put(key.copy(), pq)
        }
      }
      // dequeueAll yields worst-first; reverse → emit each key's rows in
      // sort order (the final phase's contract; harmless in the partial).
      heaps.valuesIterator.flatMap(_.dequeueAll.reverseIterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Column-API face of the operator. */
object TopKOps {

  /** Ensure the planner strategy is present on the session (idempotent).
    * Also injected by [[GraftExtensions]] for the conf-driven path. */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies =
        TopKPerKeyStrategy +: spark.experimental.extraStrategies
    }
  }

  /** Top `k` rows per key group. `order` = (column, ascending) pairs and
    * must total-order rows within a key (add a unique tiebreaker). */
  def topKPerKey(df: DataFrame, keys: Seq[String], order: Seq[(String, Boolean)],
                 k: Int): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    ensureRegistered(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val keyExprs = keys.map(attr)
    val sortOrder = order.map { case (c, asc) =>
      SortOrder(attr(c), if (asc) Ascending else Descending)
    }
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark, TopKPerKey(keyExprs, sortOrder, k, analyzed))
  }
}
