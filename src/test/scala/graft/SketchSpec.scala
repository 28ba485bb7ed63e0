package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

import graft.dedup.Dedup.portableTokenHash
import graft.operators.TypedAggregators.KMinValues

/** KMV distinct sketch: bounded mergeable state, deterministic portable
  * estimate (same construction as the q_kmv_distinct DuckDB oracle).
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val k = 64
  private def kmv = udaf(new KMinValues(k), Encoders.scalaLong)

  test("KMV is exact below k distinct values") {
    val li = Tables.load(spark, sf0001, "lineitem")
    val got = li.groupBy("l_linestatus")
      .agg(kmv(portableTokenHash($"l_returnflag")).as("sk"))
      .select($"l_linestatus", size($"sk").cast("long").as("est"))
      .as[(String, Long)].collect().toMap
    val exact = li.groupBy("l_linestatus")
      .agg(countDistinct($"l_returnflag").as("n"))
      .as[(String, Long)].collect().toMap
    assert(got === exact)
  }

  test("KMV estimate within 3/sqrt(k) of exact on fixture keys") {
    val li = Tables.load(spark, sf0001, "lineitem")
    val est = li.agg(kmv(portableTokenHash($"l_partkey".cast("string"))).as("sk"))
      .select(floor(lit((k - 1).toDouble * math.pow(2, 60)) / element_at($"sk", k)))
      .as[Long].first()
    val exact = li.select(countDistinct($"l_partkey")).as[Long].first()
    val relErr = math.abs(est - exact).toDouble / exact
    // deterministic (fixed hash), so this is a measurement, not a flake:
    // 3σ for KMV is 3/sqrt(k-2) ≈ 0.38 at k=64
    assert(relErr < 0.38, s"est=$est exact=$exact relErr=$relErr")
  }

  test("sketch rollup: merged stored states equal the direct sketch, any subset") {
    import graft.operators.SketchStore
    val ev = Tables.loadEvents(spark, sf0001)
      .withColumn("day", to_date($"ts"))
    val path = java.nio.file.Files.createTempDirectory("sketchstore").toString
    SketchStore.write(ev, path, "day", "event_type", "user_id", k)

    def direct(df: org.apache.spark.sql.DataFrame) =
      df.select($"event_type".as("grp"), portableTokenHash($"user_id".cast("string")).as("h"))
        .groupBy("grp").agg(kmv($"h").as("sk"))
        .select($"grp", SketchStore.kmvEstimate($"sk", k).as("approx"))
        .as[(String, Long)].collect().toMap

    // all buckets: merge-from-store == direct over all raw rows
    val merged = SketchStore.mergedEstimate(spark, path, k)
      .select($"grp", $"approx").as[(String, Long)].collect().toMap
    assert(merged === direct(ev), "exact merge: stored rollup must match raw sketch")

    // a bucket subset: filtered merge == direct over just those days
    val cutoff = java.sql.Date.valueOf("2024-01-08")
    val sub = SketchStore.mergedEstimate(spark, path, k, col("bucket") < lit(cutoff))
      .select($"grp", $"approx").as[(String, Long)].collect().toMap
    assert(sub === direct(ev.filter($"day" < lit(cutoff))),
      "bucket-subset merge answers without touching raw history")
  }

  test("CMS never under-counts, and batch-sketch sums equal the whole-corpus sketch") {
    import graft.operators.CountMinSketch
    val toks = Tables.load(spark, sf0001, "documents")
      .select(explode(graft.analyzer.Analyzer.tokens($"text")).as("term"))
    val est = CountMinSketch.estimate(toks, "term", d = 4, w = 64)
      .as[(String, Long)].collect().toMap
    val exact = toks.groupBy("term").count().as[(String, Long)].collect().toMap
    assert(est.keySet === exact.keySet)
    exact.foreach { case (t, n) => assert(est(t) >= n, s"under-count for $t") }
    // mergeable state: counter tables of disjoint halves ADD to the
    // whole-corpus counter table (what makes CMS maintainable per batch)
    val docs2 = Tables.load(spark, sf0001, "documents")
    def sketch(df: org.apache.spark.sql.DataFrame) =
      CountMinSketch.build(
        df.select(explode(graft.analyzer.Analyzer.tokens($"text")).as("term")),
        "term", d = 4, w = 64)
    val whole = sketch(docs2).as[(Int, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val merged = sketch(docs2.filter($"doc_id" % 2 === 0))
      .unionByName(sketch(docs2.filter($"doc_id" % 2 === 1)))
      .groupBy("row", "bucket").agg(sum($"c").as("c"))
      .as[(Int, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(merged === whole)
  }

  test("KMV merge is order-insensitive (partial aggregation safe)") {
    val agg = new KMinValues(4)
    val a = agg.merge(agg.reduce(agg.reduce(agg.zero, 5L), 1L),
      agg.reduce(agg.reduce(agg.zero, 9L), 3L))
    val b = agg.merge(agg.reduce(agg.reduce(agg.zero, 3L), 9L),
      agg.reduce(agg.reduce(agg.zero, 1L), 5L))
    assert(a === b)
    assert(a === Seq(1L, 3L, 5L, 9L))
    // duplicates collapse: a sketch of distinct hashes
    val c = agg.merge(agg.reduce(agg.reduce(agg.zero, 1L), 1L),
      agg.reduce(agg.zero, 1L))
    assert(c === Seq(1L))
  }
}
