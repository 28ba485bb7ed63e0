package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (semi-join reduction): a selective
  * filter on the dimension side materializes a bloom filter of its join
  * keys, which Catalyst injects as a pre-shuffle predicate on the fact
  * side — rows that cannot match never enter the exchange. At 100 TB
  * this is the difference between shuffling the whole fact table and
  * shuffling only the ~matching fraction. The thresholds here are
  * lowered only because the fixtures are tiny; at real scale the
  * defaults (10MB creation side / 10GB application side) self-select
  * the right joins.
  */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private def withConfs[A](pairs: (String, String)*)(body: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("selective dim filter injects a bloom filter on the fact scan side") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB") {
      val li = Tables.load(spark, sf0001, "lineitem")
      val o = Tables.load(spark, sf0001, "orders")
        .filter($"o_orderpriority" === "1-URGENT")
      val j = li.join(o, $"l_orderkey" === $"o_orderkey")
        .groupBy("o_orderstatus").count()
      val p = j.queryExecution.optimizedPlan.toString
      assert(p.contains("bloom_filter_agg"), s"no bloom creation in:\n$p")
      assert(p.contains("might_contain"), s"no bloom application in:\n$p")

      j.as[(String, Long)].collect().toMap
    }
  }

  test("bloom-pruned join result equals the unpruned join") {
    val li = Tables.load(spark, sf0001, "lineitem")
    def q = li.join(Tables.load(spark, sf0001, "orders")
        .filter($"o_orderpriority" === "1-URGENT"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy("o_orderstatus").count()
    // default confs: no injection on these tiny scans
    val plain = q.as[(String, Long)].collect().toMap
    val pruned = withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB") {
      assert(q.queryExecution.optimizedPlan.toString.contains("might_contain"))
      q.as[(String, Long)].collect().toMap
    }
    assert(pruned === plain, "bloom pruning must not change results")
  }
}
