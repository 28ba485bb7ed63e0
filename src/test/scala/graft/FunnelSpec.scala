package graft

import org.apache.spark.sql.functions._
import graft.operators.Funnel

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ev = Seq(
    // user 1: clean view → click → purchase
    (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"),
    // user 2: click BEFORE the first view — must not count as step 2
    (2L, 1L, "click"), (2L, 2L, "view"), (2L, 3L, "purchase"),
    // user 3: no click at all
    (3L, 5L, "view"), (3L, 4L, "purchase"),
    // user 4: purchase before the click — step 3 not reached
    (4L, 1L, "view"), (4L, 5L, "click"), (4L, 3L, "purchase"),
    // user 5: never viewed — not in the funnel at all
    (5L, 9L, "purchase"))
    .toDF("user_id", "sec", "event_type")
    .select($"user_id", $"sec".cast("timestamp").as("ts"), $"event_type")

  test("funnelTimes: earliest strictly-ordered step times, nulls after drop-out") {
    val got = Funnel.funnelTimes(ev, Seq("view", "click", "purchase"))
      .select($"user_id", $"t1".cast("long"), $"t2".cast("long"), $"t3".cast("long"))
      .as[(Long, Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((1L, Some(2L), Some(3L))))
    assert(got(2L) === ((2L, None, None)), "pre-view click must not convert")
    assert(got(3L) === ((5L, None, None)))
    assert(got(4L) === ((1L, Some(5L), None)), "pre-click purchase must not convert")
    assert(!got.contains(5L), "users without step 1 are outside the funnel")
  }

  test("funnelReport: per-step user counts and conversion vs step 1") {
    val rep = Funnel.funnelReport(ev, Seq("view", "click", "purchase"))
      .as[(Long, String, Long, Double)].collect().sortBy(_._1)
    assert(rep.toSeq === Seq(
      (1L, "view", 4L, 1.0),
      (2L, "click", 2L, 0.5),
      (3L, "purchase", 1L, 0.25)))
  }
}
