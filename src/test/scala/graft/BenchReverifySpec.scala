package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.BenchReverify.{Entry, calibrationRatio, merge, outliers, parseJsonl, render}

/** The committed-bench outlier discipline: synthetic inflation is
  * detected, re-measured values win, clean sweeps pass untouched — no
  * SparkSession needed, the logic is pure. */
class BenchReverifySpec extends AnyFunSuite {

  private val prev = Seq(
    Entry("q_a", 3.0, ok = true, reps = 2),
    Entry("q_b", 0.4, ok = true, reps = 3),
    Entry("q_c", 10.0, ok = true, reps = 2),
    Entry("q_gone", 5.0, ok = true, reps = 2))

  test("synthetic inflation is flagged; clean entries are not") {
    val cur = Seq(
      Entry("q_a", 31.6, ok = true, reps = 2),  // r11's actual failure shape
      Entry("q_b", 0.9, ok = true, reps = 3),   // >1.5x but sub-second: skip
      Entry("q_c", 11.0, ok = true, reps = 2))  // within 1.5x: clean
    assert(outliers(prev, cur) === Seq("q_a"))
  }

  test("new slow-band entries re-verify; new fast entries do not") {
    val cur = Seq(
      Entry("q_new_big", 7.0, ok = true, reps = 2),
      Entry("q_new_small", 1.2, ok = true, reps = 2))
    assert(outliers(prev, cur) === Seq("q_new_big"))
  }

  test("the new-entry band is era-relative (ADVICE r14)") {
    // 4.0 s: under the raw 5 s floor, but in a fast era (calRatio 0.7)
    // the era-scaled band is 3.5 s — an inflated first committed number
    // must not escape just because the box is quick this window
    val cur = Seq(Entry("q_new_mid", 4.0, ok = true, reps = 2))
    assert(outliers(prev, cur, calRatio = 0.7) === Seq("q_new_mid"))
    // ...and in a slow era (calRatio 1.4, band 7 s) the same number is
    // expected box drag, not a suspect first measurement
    assert(outliers(prev, cur, calRatio = 1.4) === Seq.empty)
    assert(outliers(prev, cur) === Seq.empty) // neutral era: raw floor
  }

  test("failed entries never re-run (failures are deterministic)") {
    val cur = Seq(Entry("q_a", 31.6, ok = false, reps = 1))
    assert(outliers(prev, cur) === Seq.empty)
  }

  test("merge commits the re-measured min with the reverified stamp") {
    val cur = Seq(
      Entry("q_a", 31.6, ok = true, reps = 2),
      Entry("q_c", 11.0, ok = true, reps = 2))
    val re = Seq(Entry("q_a", 3.4, ok = true, reps = 2))
    val m = merge(cur, re)
    assert(m.find(_.name == "q_a").get ===
      Entry("q_a", 3.4, ok = true, reps = 4, reverified = true))
    assert(m.find(_.name == "q_c").get ===
      Entry("q_c", 11.0, ok = true, reps = 2)) // untouched, unstamped
  }

  test("a genuine regression survives re-measurement, stamped not excused") {
    val cur = Seq(Entry("q_a", 9.0, ok = true, reps = 2))
    val re = Seq(Entry("q_a", 8.8, ok = true, reps = 2))
    val m = merge(cur, re)
    assert(m.head.secs === 8.8 && m.head.reverified)
  }

  test("a planned outlier with no successful re-measurement fails the merge") {
    val cur = Seq(
      Entry("q_a", 31.6, ok = true, reps = 2),
      Entry("q_c", 11.0, ok = true, reps = 2))
    // re-run missing entirely: the suspect original must not pass
    // through unstamped as if never questioned
    val e1 = intercept[IllegalArgumentException] {
      merge(cur, Seq.empty, planned = Seq("q_a"))
    }
    assert(e1.getMessage.contains("q_a"))
    // re-run present but FAILED: same refusal (ok=false re-measurements
    // are filtered, so the plan stays unsatisfied)
    val e2 = intercept[IllegalArgumentException] {
      merge(cur, Seq(Entry("q_a", 3.4, ok = false, reps = 1)),
        planned = Seq("q_a"))
    }
    assert(e2.getMessage.contains("q_a"))
    // satisfied plan merges exactly like the unplanned call
    val m = merge(cur, Seq(Entry("q_a", 3.4, ok = true, reps = 2)),
      planned = Seq("q_a"))
    assert(m.find(_.name == "q_a").get.reverified)
  }

  test("a uniform box-slow era reads as calibration drift, not per-entry outliers") {
    // VERDICT r13 #2 (What's wrong): a ~26% across-the-board inflation —
    // the mode every round since r4 has fought — slips under the 1.5×
    // factor on EVERY entry, so the old criterion flagged nothing and a
    // judge re-adjudicated by hand. With calibration rows on both sides
    // the era reduces to one ratio and the sweep stays unflagged.
    val cal = Seq(
      Entry("cal_cpu", 1.00, ok = true, reps = 3, cal = true),
      Entry("cal_shuffle", 0.80, ok = true, reps = 3, cal = true),
      Entry("cal_io", 2.00, ok = true, reps = 3, cal = true))
    val prevEra = cal ++ (1 to 50).map(i => Entry(s"q_$i", 4.0, ok = true, reps = 2))
    val curEra = cal.map(e => e.copy(secs = e.secs * 1.26)) ++
      (1 to 50).map(i => Entry(s"q_$i", 4.0 * 1.26, ok = true, reps = 2))
    val ratio = calibrationRatio(prevEra, curEra)
    assert(ratio.exists(r => math.abs(r - 1.26) < 1e-9), s"ratio: $ratio")
    // unnormalized: structurally missed (nothing exceeds 1.5×) — the
    // artifact would commit 50 silently-inflated numbers
    assert(outliers(prevEra, curEra) === Seq.empty)
    // normalized: still empty, but now BECAUSE the drift is attributed
    // to the era's one committed CAL_RATIO, not because it went unseen
    assert(outliers(prevEra, curEra, calRatio = ratio.get) === Seq.empty)
    // a query that regressed past factor× RELATIVE TO THE ERA still flags
    val withReal = curEra.map(e =>
      if (e.name == "q_7") e.copy(secs = 4.0 * 1.26 * 1.6) else e)
    assert(outliers(prevEra, withReal, calRatio = ratio.get) === Seq("q_7"))
    // calibration rows are never outlier candidates themselves, even
    // when a probe individually spikes past the factor
    val probeSpike = curEra.map(e =>
      if (e.name == "cal_io") e.copy(secs = 9.0) else e)
    assert(!outliers(prevEra, probeSpike, calRatio = 1.0).exists(_.startsWith("cal_")))
  }

  test("calibrationRatio is None without common probes; merge leaves cal rows alone") {
    // pre-r14 evidence has no cal rows: callers fall back to 1.0 (the
    // old behavior, unchanged)
    assert(calibrationRatio(prev, Seq(Entry("q_a", 3.0, ok = true, reps = 2))) === None)
    // a subset re-run's own cal rows never fold into the sweep's, and
    // the sweep's pass through unstamped
    val cur = Seq(
      Entry("cal_cpu", 1.0, ok = true, reps = 3, cal = true),
      Entry("q_a", 31.6, ok = true, reps = 2))
    val re = Seq(
      Entry("cal_cpu", 0.5, ok = true, reps = 3, cal = true),
      Entry("q_a", 3.4, ok = true, reps = 2))
    val m = merge(cur, re, planned = Seq("q_a"))
    assert(m.find(_.name == "cal_cpu").get ===
      Entry("cal_cpu", 1.0, ok = true, reps = 3, cal = true))
    assert(m.find(_.name == "q_a").get.secs === 3.4)
  }

  test("render excludes cal rows from queries/total and emits the calibration field") {
    val entries = Seq(
      Entry("cal_cpu", 1.5, ok = true, reps = 3, cal = true),
      Entry("q_a", 3.4, ok = true, reps = 4, reverified = true))
    val (jsonl, json) = render(entries, reps = 3, sfDir = "/root/testdata/sf0.1")
    assert(parseJsonl(jsonl) === entries) // cal stamp survives the roundtrip
    assert(json.contains(""""value":3.4"""), json)       // total = queries only
    assert(json.contains(""""calibration":{"cal_cpu":1.5}"""), json)
    assert(!json.contains(""""cal_cpu":1.5,"q_a""""), json) // not inside queries
  }

  test("render/parse roundtrip preserves entries and the stamp") {
    val entries = Seq(
      Entry("q_a", 3.4, ok = true, reps = 4, reverified = true),
      Entry("q \"odd\"", 0.5, ok = true, reps = 3))
    val (jsonl, json) = render(entries, reps = 3, sfDir = "/root/testdata/sf0.1")
    assert(parseJsonl(jsonl) === entries)
    assert(json.contains(""""value":3.9""") &&
      json.contains(""""reverified":["q_a"]"""), json)
  }

  test("parse reads Bench's real artifact lines") {
    val parsed = parseJsonl(Seq(
      """{"name":"q_chunk","secs":0.756658498,"ok":true,"reps":3}"""))
    assert(parsed === Seq(Entry("q_chunk", 0.756658498, ok = true, reps = 3)))
  }

  test("the source sweep's geometry provenance carries verbatim through render") {
    // ADVICE r18: the merge must stamp the geometry the SWEEP ran, not a
    // recompute against the current (possibly regenerated) fixture — the
    // source artifact's own field wins whenever it exists.
    val src = """{"metric":"total","value":1.0,"queries":{"q_dedup_embed":1.0},""" +
      """"geometry":{"q_dedup_embed":{"n":60000,"band_bits":9,"bands":64,""" +
      """"expected_occupancy":117,"recall_at_min_cos":0.8149}},"reverified":[]}"""
    val field = BenchReverify.geometryField(src)
    assert(field.exists(_.startsWith(""""geometry":{""")), field)
    assert(field.exists(_.endsWith("""0.8149}}""")), field)
    val entries = Seq(Entry("q_dedup_embed", 1.0, ok = true, reps = 2))
    val (_, json) = render(entries, reps = 2,
      sfDir = "/root/testdata/sf0.1", srcGeometry = field)
    assert(json.contains(""""band_bits":9"""), json) // the sweep's 9, never
    // a fixture recompute (sf0.1's own count would derive different bits)
    assert(json.contains(""""recall_at_min_cos":0.8149"""), json)
    // artifacts that predate the field: None → the legacy fallback path
    assert(BenchReverify.geometryField("""{"metric":"total","value":1.0}""") === None)
    // a truncated field must read as absent, never a half-parsed stamp
    assert(BenchReverify.geometryField(""""geometry":{"q":{"n":1""") === None)
  }

  test("a mid-sweep mark's next field survives parse, merge and render") {
    // ADVICE r15: Bench records which gate entry follows each mid-sweep
    // calibration mark ("next"). The merge rewrite re-serializes every
    // line, so the field must round-trip or the committed artifact
    // silently loses the cache-exposure record (the r16 first sweep did).
    val entries = parseJsonl(Seq(
      """{"name":"cal_io_t1","secs":0.24,"ok":true,"reps":3,"cal":true,"next":"q_dedup_keep"}""",
      """{"name":"q_dedup_keep","secs":4.0,"ok":true,"reps":2}"""))
    assert(entries.head.next === Some("q_dedup_keep"))
    val merged = merge(entries,
      Seq(Entry("q_dedup_keep", 3.5, ok = true, reps = 2)), Seq("q_dedup_keep"))
    val (jsonl, _) = render(merged, reps = 2, sfDir = "/root/testdata/sf0.1")
    assert(jsonl.head.contains(""""next":"q_dedup_keep""""), jsonl.head)
    assert(parseJsonl(jsonl) === merged)
  }
}
