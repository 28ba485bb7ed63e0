package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TopKOps

/** The custom top-k-per-key operator (logical node + strategy + physical
  * partial/final heaps) against the window formulation it replaces.
  */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("topKPerKey matches the window row_number formulation exactly") {
    val orders = Tables.load(spark, sf0001, "orders")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    val viaWindow = orders.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3).drop("rn")
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .as[(Long, Long, Double)].collect().toSet
    val viaOp = TopKOps.topKPerKey(orders,
        keys = Seq("o_custkey"),
        order = Seq("o_totalprice" -> false, "o_orderkey" -> true), k = 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .as[(Long, Long, Double)].collect().toSet
    assert(viaOp === viaWindow)
  }

  test("plan is partial/final heaps around one exchange, no WindowExec") {
    val orders = Tables.load(spark, sf0001, "orders")
    val df = TopKOps.topKPerKey(orders, Seq("o_custkey"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix: the node prints as
    // "TopKPerKey [keys], [order], k, partial"
    assert("TopKPerKey \\[".r.findAllIn(p).size >= 2, s"expected partial+final:\n$p")
    assert(p.contains("Exchange hashpartitioning(o_custkey"),
      s"expected key exchange between phases:\n$p")
    assert(!p.contains("Window"), s"window executor should not appear:\n$p")
  }

  test("k larger than any group returns every row") {
    val orders = Tables.load(spark, sf0001, "orders")
    val n = TopKOps.topKPerKey(orders, Seq("o_custkey"),
      Seq("o_orderkey" -> true), k = 1000000).count()
    assert(n === orders.count())
  }

  test("registered via GraftExtensions planner strategy injection") {
    // the conf-driven path: a fresh session with spark.sql.extensions set
    // would get the strategy without code; here we assert it is at least
    // injectable and idempotent on the live session
    TopKOps.ensureRegistered(spark)
    TopKOps.ensureRegistered(spark)
    assert(spark.experimental.extraStrategies
      .count(_ == org.apache.spark.sql.graft.TopKPerKeyStrategy) === 1)
  }
}
