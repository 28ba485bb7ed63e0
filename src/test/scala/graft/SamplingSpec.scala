package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf0001, "documents")

  test("deterministic sample: stable across runs, near the target fraction") {
    val a = Sampling.deterministicSample(docs, "doc_id", 0.1)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.deterministicSample(docs, "doc_id", 0.1)
      .select("doc_id").as[Long].collect().toSet
    assert(a === b, "same data + salt must select identical rows")
    val n = docs.count()
    assert(math.abs(a.size.toDouble / n - 0.1) < 0.05,
      s"sample fraction drifted: ${a.size}/$n")
  }

  test("larger fraction is a superset (nested samples)") {
    val small = Sampling.deterministicSample(docs, "doc_id", 0.1)
      .select("doc_id").as[Long].collect().toSet
    val big = Sampling.deterministicSample(docs, "doc_id", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(small.subsetOf(big),
      "threshold sampling nests: frac 0.1 selection is contained in 0.5")
  }

  test("different salts give independent selections") {
    val a = Sampling.deterministicSample(docs, "doc_id", 0.5, salt = "s1")
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.deterministicSample(docs, "doc_id", 0.5, salt = "s2")
      .select("doc_id").as[Long].collect().toSet
    assert(a !== b)
    // independence: overlap ≈ 25% of corpus, far from 0 or 50%
    val overlap = a.intersect(b).size.toDouble / docs.count()
    assert(overlap > 0.1 && overlap < 0.4, s"suspicious overlap $overlap")
  }

  test("split assignment is exhaustive, disjoint, and weight-shaped") {
    val split = Sampling.assignSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count().as[(String, Long)].collect().toMap
    val n = docs.count()
    assert(counts.values.sum === n, "every row gets exactly one split")
    assert(counts.keySet === Set("train", "val", "test"))
    assert(math.abs(counts("train").toDouble / n - 0.8) < 0.06,
      s"train weight drifted: $counts")
  }

  test("stratified sample: per-stratum fractions honored, unlisted strata dropped") {
    val frac = Map("en" -> 0.1, "fr" -> 0.6)
    val got = Sampling.stratifiedSample(docs, "doc_id", "lang", frac)
    val byLang = got.groupBy("lang").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang.keySet.subsetOf(Set("en", "fr")), s"unlisted strata leaked: $byLang")
    assert(math.abs(byLang.getOrElse("en", 0L).toDouble / totals("en") - 0.1) < 0.08)
    assert(math.abs(byLang.getOrElse("fr", 0L).toDouble / totals("fr") - 0.6) < 0.15)
    // deterministic: same call, same rows
    val again = Sampling.stratifiedSample(docs, "doc_id", "lang", frac)
      .select("doc_id").as[Long].collect().toSet
    assert(again === got.select("doc_id").as[Long].collect().toSet)
  }

  test("weighted sample: deterministic, and high-weight rows are favored") {
    val a = Sampling.weightedSample(docs, "doc_id", "n_chars", 20)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.weightedSample(docs, "doc_id", "n_chars", 20)
      .select("doc_id").as[Long].collect().toSet
    assert(a === b, "same data + salt must draw the identical sample")
    // A-ES with weight w: P(in) ∝ w — the drawn docs should skew long;
    // deterministic hash, so this is a measurement, not a flake
    val avgAll = docs.agg(avg($"n_chars")).as[Double].first()
    val avgSel = docs.filter($"doc_id".isin(a.toSeq: _*))
      .agg(avg($"n_chars")).as[Double].first()
    assert(avgSel > avgAll,
      s"weighted draw should favor long docs: sel=$avgSel all=$avgAll")
  }

  test("upsample: floor(w) copies plus hash-decided extra, unlisted strata dropped") {
    val in = docs.select("doc_id", "lang")
    val weights = Map("fr" -> 2.5, "de" -> 1.0, "es" -> 0.4)
    val out = Sampling.upsample(in, "doc_id", "lang", weights)
      .as[(Long, String, Long)].collect()
    val copies = out.groupBy(r => (r._1, r._2)).view.mapValues(_.length).toMap
    // copy column is 1..n per doc
    out.groupBy(r => (r._1, r._2)).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length))
    }
    // weight 1.0 → exactly one copy for every de doc
    val deDocs = in.filter($"lang" === "de").select("doc_id").as[Long].collect()
    deDocs.foreach(id => assert(copies((id, "de")) === 1))
    // weight 2.5 → every fr doc has 2 or 3 copies; average near 2.5
    val frCounts = copies.collect { case ((_, "fr"), n) => n }
    assert(frCounts.forall(n => n == 2 || n == 3))
    val frAvg = frCounts.sum.toDouble / frCounts.size
    assert(math.abs(frAvg - 2.5) < 0.35, s"fr avg copies $frAvg")
    // weight 0.4 → es docs appear 0 or 1 times, roughly 40%
    val esTotal = in.filter($"lang" === "es").count()
    val esKept = copies.collect { case ((_, "es"), n) => n }
    assert(esKept.forall(_ == 1))
    assert(math.abs(esKept.size.toDouble / esTotal - 0.4) < 0.15)
    // unlisted strata (en, zh) produce no rows
    assert(!out.exists(r => r._2 == "en" || r._2 == "zh"))
    // deterministic: a second invocation is identical
    val again = Sampling.upsample(in, "doc_id", "lang", weights)
      .as[(Long, String, Long)].collect()
    assert(again.toSet === out.toSet)
  }

  test("temperature resample: balanced strata untouched, skew flattened toward uniform") {
    // perfectly balanced: every r = 1 → identity (one copy per row)
    val balanced = (1L to 40L).map(i => (i, if (i <= 20) "a" else "b"))
      .toDF("doc_id", "lang")
    val outB = Sampling.temperatureResample(balanced, "doc_id", "lang")
      .as[(String, Long, Long)].collect()
    assert(outB.length === 40 && outB.forall(_._3 == 1L),
      "equal strata have factor exactly 1 — no row dropped or replicated")

    // 9:1 skew at α=0.5 → target shares 3:1 — minority replicated ~3×,
    // majority sampled at ~0.75
    val skewed = (1L to 200L).map(i => (i, if (i <= 180) "big" else "small"))
      .toDF("doc_id", "lang")
    val out = Sampling.temperatureResample(skewed, "doc_id", "lang")
      .as[(String, Long, Long)].collect()
    val byLang = out.groupBy(_._1).view.mapValues(_.length).toMap
    // r_small = (√20/(√180+√20))·(200/20) = 2.5; r_big = (√180/…)·(200/180) ≈ 0.833
    assert(byLang("small") > 20 && byLang("small") <= 3 * 20,
      s"minority must be upweighted, got ${byLang("small")}")
    assert(byLang("big") < 180, s"majority must be downsampled, got ${byLang("big")}")
    // deterministic
    val again = Sampling.temperatureResample(skewed, "doc_id", "lang")
      .as[(String, Long, Long)].collect()
    assert(again.toSet === out.toSet)
  }

  test("decontaminate drops exactly the flagged training docs; bench side broadcasts") {
    import graft.pipeline.Contamination
    val bench = docs.filter($"doc_id" % 50 === 0)
    val train = docs.filter($"doc_id" % 50 =!= 0)
    val pairs = Contamination.contaminatedPairs(train, bench, minShared = 2L)
    val flagged = pairs.select("train_id").distinct().as[Long].collect().toSet
    val clean = Contamination.decontaminate(train, bench, minShared = 2L)
      .select("doc_id").as[Long].collect().toSet
    val trainIds = train.select("doc_id").as[Long].collect().toSet
    assert(clean === trainIds -- flagged)
    assert(flagged.nonEmpty, "fixture should contain cross-set contamination")
    // the benchmark side must broadcast: no shuffle of corpus shingles
    // before the join
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected BHJ in:\n$plan")
  }
}
