package graft

import org.apache.spark.sql.functions._
import graft.operators.Bucketing

/** The co-located-join claim from SCALE.md, made observable: a join of
  * two same-bucketed tables must plan with NO shuffle (Exchange) on
  * either side.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucketed tables join without any Exchange") {
    val li = Tables.load(spark, sf0001, "lineitem").select("l_orderkey", "l_quantity")
    val o = Tables.load(spark, sf0001, "orders")
      .select($"o_orderkey".as("l_orderkey"), $"o_totalprice")
    Bucketing.writeBucketed(li, "li_bkt", "l_orderkey", 8)
    Bucketing.writeBucketed(o, "o_bkt", "l_orderkey", 8)

    // force the sort-merge path: at real scale neither fact side
    // broadcasts; on these tiny fixtures it would, hiding the bucketing
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val plan = try {
      val joined = Bucketing.cogroupJoin(spark, "li_bkt", "o_bkt", "l_orderkey")
      joined.collect() // finalize AQE
      joined.queryExecution.executedPlan.toString
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")

    // result parity with the plain (shuffling) join
    val joined = Bucketing.cogroupJoin(spark, "li_bkt", "o_bkt", "l_orderkey")
    val plain = li.join(o, "l_orderkey")
    assert(joined.count() === plain.count())
    val a = joined.agg(sum($"l_quantity".cast("decimal(25,6)")),
      sum($"o_totalprice".cast("decimal(25,6)"))).first()
    val b = plain.agg(sum($"l_quantity".cast("decimal(25,6)")),
      sum($"o_totalprice".cast("decimal(25,6)"))).first()
    assert(a === b)
  }
}
