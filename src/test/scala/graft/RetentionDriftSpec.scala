package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Drift, Retention}

class RetentionDriftSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int): Timestamp =
    // 2024-01-04 is a Thursday = epoch-week boundary (epoch day 0 was a
    // Thursday), so day 0..6 here spans exactly one epoch week
    Timestamp.valueOf(java.time.LocalDateTime.of(2024, 1, 4 + day, 0, 0))

  test("cohortRetention counts distinct cohort members per week offset") {
    val e = Seq(
      (1L, ts(0)), (1L, ts(1)),  // user 1: cohort w0, active w0 only
      (2L, ts(0)), (2L, ts(8)),  // user 2: cohort w0, back in w1
      (3L, ts(7)), (3L, ts(16))) // user 3: cohort w1, back in w2
      .toDF("user_id", "ts")
    val r = Retention.cohortRetention(e).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    val w0 = r.keys.map(_._1).min
    val w1 = w0 + 604800L
    assert(r == Map(
      (w0, 0L) -> 2L, (w0, 1L) -> 1L,
      (w1, 0L) -> 1L, (w1, 1L) -> 1L))
  }

  test("psi is zero for identical distributions and positive under shift") {
    // pair construction: ids 2k+1 (odd) and 2k+2 (even) carry the SAME
    // value, so the two halves have identical distributions → PSI 0
    val same = (0 until 50).flatMap { k =>
      val v = (k % 4) * 10.0 + 1
      Seq((2L * k + 1, "g", v), (2L * k + 2, "g", v))
    }.toDF("id", "grp", "v")
    val r0 = Drift.psi(same, "grp", "v", col("id") % 2 === 0, col("id") % 2 === 1, 10.0)
      .collect().head
    assert(r0.getDouble(2) == 0.0, s"identical halves must give PSI 0, got $r0")

    // same support, shifted mass: even 80/20 vs odd 20/80 over buckets
    // {0,1} → PSI = 2 · 0.6 · ln 4 ≈ 1.66
    val drift = (0 until 50).flatMap { k =>
      Seq((2L * k + 2, "g", if (k < 40) 5.0 else 15.0),
        (2L * k + 1, "g", if (k < 10) 5.0 else 15.0))
    }.toDF("id", "grp", "v")
    val r1 = Drift.psi(drift, "grp", "v", col("id") % 2 === 0, col("id") % 2 === 1, 10.0)
      .collect().head
    assert(math.abs(r1.getDouble(2) - 1.2 * math.log(4.0)) < 1e-6,
      s"shifted halves must flag drift, got $r1")

    // the many-group plan (groupBy+join totals instead of a per-group
    // window) computes the same exact integer totals → identical output
    val r1m = Drift.psi(drift, "grp", "v", col("id") % 2 === 0, col("id") % 2 === 1,
      10.0, manyGroups = true).collect().head
    assert(r1m.getLong(1) == r1.getLong(1) && r1m.getDouble(2) == r1.getDouble(2),
      s"manyGroups variant must match the window plan: $r1m vs $r1")
  }

  test("winsorize clips to group percentiles and leaves interior values alone") {
    val df = ((1 to 100).map(i => ("g", i.toLong, i.toDouble))).toDF("grp", "id", "v")
    val r = graft.operators.Distribution.winsorize(df, "grp", "id", "v", 0.05, 0.95)
      .collect().map(x => x.getLong(1) -> x.getDouble(3)).toMap
    // exact interpolated percentiles of 1..100: p05 = 5.95, p95 = 95.05
    assert(r(1L) == 5.95 && r(3L) == 5.95)
    assert(r(100L) == 95.05 && r(97L) == 95.05)
    assert(r(50L) == 50.0)
  }

  test("linearFit recovers an exact line and flags zero-variance groups") {
    val exact = ((0 until 50).map(i => ("a", i.toDouble, 3.0 * i + 7.0)) ++
      (0 until 5).map(_ => ("b", 2.0, 9.0))).toDF("grp", "x", "y")
    val r = graft.operators.Regression.linearFit(exact, "grp", "x", "y")
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), Option(x.get(2)), Option(x.get(3)))).toMap
    assert(r("a") == ((50L, Some(3.0), Some(7.0))))
    assert(r("b") == ((5L, None, None)))
  }

  test("psi excludes buckets empty on either side") {
    val df = Seq(
      (1L, "g", 5.0), (2L, "g", 5.0),   // bucket 0: both sides (ids 1,2)
      (3L, "g", 15.0),                   // bucket 1: odd side only
      (4L, "g", 25.0))                   // bucket 2: even side only
      .toDF("id", "grp", "v")
    val r = Drift.psi(df, "grp", "v", col("id") % 2 === 0, col("id") % 2 === 1, 10.0)
      .collect().head
    assert(r.getLong(1) == 1L)
  }
}
