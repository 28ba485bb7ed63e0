package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.TemporalJoins

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("asofJoin: latest right row at-or-before each left row, per key") {
    val trades = Seq(
      (1L, 10L, t("2024-01-01 10:00:05")),
      (2L, 10L, t("2024-01-01 10:00:10")),
      (3L, 20L, t("2024-01-01 10:00:01")),
      (4L, 30L, t("2024-01-01 10:00:01"))   // key with no quotes at all
    ).toDF("trade_id", "acct", "ts")
    val quotes = Seq(
      (10L, t("2024-01-01 10:00:03"), 101.0),
      (10L, t("2024-01-01 10:00:10"), 102.0), // equal ts → inclusive
      (20L, t("2024-01-01 10:00:02"), 55.0)   // after the only trade
    ).toDF("acct", "ts", "px")
    val res = TemporalJoins.asofJoin(trades, quotes, "acct", "ts", Seq("px"))
      .select($"trade_id", $"asof_px").as[(Long, Option[Double])]
      .collect().toMap
    assert(res(1L) === Some(101.0))
    assert(res(2L) === Some(102.0)) // same-instant quote attaches (>= semantics)
    assert(res(3L) === None)        // quote is after the trade
    assert(res(4L) === None)        // key absent from right side
  }

  test("rangeJoin: pairs within the window, including cross-bucket pairs") {
    val ev = Seq(
      (1L, 7L, t("2024-01-01 10:00:00")),
      (2L, 7L, t("2024-01-01 10:04:00")), // 240s after 1 → in window
      (3L, 7L, t("2024-01-01 10:06:30")), // 150s after 2; 390s after 1 → only (2,3)
      (4L, 8L, t("2024-01-01 10:00:30"))  // other key
    ).toDF("event_id", "user_id", "ts")
    val res = TemporalJoins.rangeJoin(ev, "user_id", "ts", "event_id", 300)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(res === Set((1L, 2L), (2L, 3L)))
  }

  test("rangeJoin matches a naive inequality join on fixture events") {
    val ev = Tables.loadEvents(spark, sf0001)
    val banded = TemporalJoins.rangeJoin(ev, "user_id", "ts", "event_id", 300)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val a = ev.select($"user_id", $"event_id".as("id_a"), $"ts".as("ta"))
    val b = ev.select($"user_id", $"event_id".as("id_b"), $"ts".as("tb"))
    val naive = a.join(b, "user_id")
      .filter($"ta" < $"tb" && $"tb".cast("double") - $"ta".cast("double") <= 300)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(banded === naive)
    assert(banded.nonEmpty)
  }
}
