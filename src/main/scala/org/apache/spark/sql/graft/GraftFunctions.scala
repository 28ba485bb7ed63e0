package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for graft's custom expressions, so
  * `spark.sql("SELECT graft_dot(a, b) ...")` works alongside the Column
  * API.
  *
  * Two registration paths:
  *   - [[GraftFunctions.register]] — imperative, for an existing session
  *     (classic deployments, tests).
  *   - [[GraftExtensions]] — declarative, for
  *     `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  *     (cluster-wide rollout without code changes).
  */
object GraftFunctions {

  private val dotBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => FloatVectorDot(a, b)
    case other => throw new IllegalArgumentException(
      s"graft_dot expects 2 arguments, got ${other.size}")
  }

  private val dotInfo = new ExpressionInfo(
    classOf[FloatVectorDot].getCanonicalName, "graft_dot")

  private val charHistBuilder: Seq[Expression] => Expression = {
    case Seq(s) => CharHistogram(s)
    case other => throw new IllegalArgumentException(
      s"graft_char_hist expects 1 argument, got ${other.size}")
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", dotBuilder, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_char_hist", charHistBuilder, "scala_udf")
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getCanonicalName, "graft_dot"),
      { exprs: Seq[Expression] => FloatVectorDot(exprs(0), exprs(1)) }))
    e.injectFunction((new FunctionIdentifier("graft_char_hist"),
      new ExpressionInfo(classOf[CharHistogram].getCanonicalName, "graft_char_hist"),
      { exprs: Seq[Expression] => CharHistogram(exprs(0)) }))
    e.injectOptimizerRule(_ => RewriteVectorDot)
    e.injectPlannerStrategy(_ => TopKPerKeyStrategy)
  }
}
