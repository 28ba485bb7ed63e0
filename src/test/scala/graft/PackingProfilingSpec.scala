package graft

import org.apache.spark.sql.functions._
import graft.operators.Profiling
import graft.pipeline.Packing
import graft.text.TextAnalysis

class PackingProfilingSpec extends SparkSpec {
  import spark.implicits._

  // ---- sequence packing ----

  private lazy val toks = Tables.load(spark, sf0001, "documents")
    .select(col("doc_id"),
      graft.analyzer.Analyzer.tokenCount(col("text")).cast("long").as("n_tok"))

  test("packing: offsets are contiguous running sums within a shard") {
    val a = Packing.packAssignments(toks, "doc_id", "n_tok", nShards = 4, seqLen = 256)
      .select("shard", "offset", "pack_id", "n_tok").collect()
    a.groupBy(_.getInt(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.head.getLong(1) === 0L, "first doc of a shard starts at offset 0")
      sorted.sliding(2).foreach {
        case Array(p, n) =>
          assert(n.getLong(1) === p.getLong(1) + p.getLong(3),
            "next offset = previous offset + previous doc's tokens")
        case _ => ()
      }
      sorted.foreach(r => assert(r.getLong(2) === r.getLong(1) / 256,
        "pack id is the integer-div of the start offset"))
    }
  }

  test("packing: conserves docs and tokens, deterministic under repartitioning") {
    val report = Packing.packReport(toks, "doc_id", "n_tok", nShards = 4, seqLen = 256)
    val (docsTot, tokTot) = report.agg(sum("n_docs"), sum("n_tokens"))
      .as[(Long, Long)].head()
    val (expDocs, expTok) = toks.agg(count(lit(1)), sum("n_tok")).as[(Long, Long)].head()
    assert(docsTot === expDocs, "every doc lands in exactly one pack")
    assert(tokTot === expTok, "token mass is conserved")
    val again = Packing.packReport(toks.repartition(13), "doc_id", "n_tok",
      nShards = 4, seqLen = 256)
    assert(report.except(again).isEmpty && again.except(report).isEmpty,
      "layout is a pure function of the data, not the partitioning")
  }

  test("packing: pack ids cover 0..max without gaps per shard") {
    val report = Packing.packReport(toks, "doc_id", "n_tok", nShards = 4, seqLen = 256)
      .select("shard", "pack_id").as[(Int, Long)].collect()
    report.groupBy(_._1).foreach { case (shard, rows) =>
      val ids = rows.map(_._2).sorted
      assert(ids.head === 0L, s"shard $shard starts at pack 0")
      // a doc longer than seqLen can start a pack and swallow the next
      // boundary, but with seqLen >> max doc the cover is gap-free
      assert(ids.zip(ids.tail).forall { case (a, b) => b - a <= 1 },
        s"shard $shard pack ids have gaps: ${ids.mkString(",")}")
    }
  }

  // ---- profiling ----

  test("profile: nulls / distinct / min / max per column") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), None),
      (Some(2L), Some("c")), (None, Some("a"))
    ).toDF("k", "s")
    val got = Profiling.profile(df, Seq("k", "s"))
      .as[(String, Long, Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("k") === ((1L, 2L, "1", "2")))
    assert(got("s") === ((1L, 2L, "a", "c")))
  }

  test("profile: approx mode uses HLL but keeps the report shape") {
    val df = spark.range(1000).select(col("id"), (col("id") % 10).as("m"))
    val got = Profiling.profile(df, Seq("id", "m"), exact = false)
      .as[(String, Long, Long, String, String)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(math.abs(got("id") - 1000L) < 50, s"HLL estimate off: ${got("id")}")
    assert(got("m") === 10L)
  }

  // ---- char entropy ----

  private def entropyOf(s: String): (Long, Double) = {
    val (n, _, e) = TextAnalysis.charEntropy(col("t"))
    Seq(s).toDF("t").select(n, e).as[(Long, Double)].head()
  }

  test("char entropy: degenerate and uniform distributions") {
    assert(entropyOf("aaaa") === ((4L, 0.0)), "single letter → zero entropy")
    val (n2, e2) = entropyOf("abab")
    assert(n2 === 4L && math.abs(e2 - 1.0) < 1e-12, "two equiprobable letters → 1 bit")
    val (n26, e26) = entropyOf(('a' to 'z').mkString)
    assert(n26 === 26L && math.abs(e26 - math.log(26) / math.log(2)) < 1e-9,
      "uniform alphabet → log2(26) bits")
    assert(entropyOf("123 456!") === ((0L, 0.0)), "no letters → zero, not NaN")
  }

  test("char entropy: case-insensitive and punctuation-blind") {
    assert(entropyOf("AbAb") === entropyOf("abab"))
    assert(entropyOf("a-b a-b") === entropyOf("abab"))
  }

  test("char histogram: one-pass bins match per-letter counts, multibyte-safe") {
    import org.apache.spark.sql.graft.CharHistogram
    // multibyte code points (é, ö, ï, –) must not perturb ASCII bins:
    // UTF-8 continuation bytes all have the high bit set
    val s = "héllo wörld – ünïcode zz"
    val bins = Seq(s).toDF("t")
      .select(CharHistogram.charHist(col("t"))).as[Seq[Long]].head()
    val expected = ('a' to 'z').map(ch => s.count(_ == ch).toLong)
    assert(bins === expected)
    // null propagates, empty string is all-zero
    val nulls = Seq[String](null).toDF("t")
      .select(CharHistogram.charHist(col("t"))).collect()
    assert(nulls.head.isNullAt(0))
    assert(Seq("").toDF("t").select(CharHistogram.charHist(col("t")))
      .as[Seq[Long]].head() === Seq.fill(26)(0L))
  }

  test("packAssignments refuses inputs with reserved output columns") {
    val df = Seq((1L, 10L)).toDF("doc_id", "n_tok").withColumn("shard", lit(9))
    val e = intercept[IllegalArgumentException](
      Packing.packAssignments(df, "doc_id", "n_tok", 4, 128))
    assert(e.getMessage.contains("shard"))
  }

  // ---- correlation matrix ----

  test("correlationMatrix: exact on perfectly correlated columns") {
    val df = (1 to 100).map(i => (i.toDouble, 2.0 * i + 3.0, -0.5 * i))
      .toDF("x", "y", "z")
    val m = Profiling.correlationMatrix(df, Seq("x", "y", "z"))
      .as[(String, String, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(m(("x", "y")) === 1.0)   // positive linear
    assert(m(("x", "z")) === -1.0)  // negative linear
    assert(m(("y", "z")) === -1.0)
    assert(m.size === 3, "C(3,2) unordered pairs")
  }

  test("correlationMatrix agrees with builtin corr and ignores partitioning") {
    val li = Tables.load(spark, sf0001, "lineitem")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val ours = Profiling.correlationMatrix(li, cols)
      .as[(String, String, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val builtin = li.agg(
      corr(col("l_quantity"), col("l_extendedprice")),
      corr(col("l_quantity"), col("l_discount")),
      corr(col("l_extendedprice"), col("l_discount")))
      .as[(Double, Double, Double)].head()
    assert(math.abs(ours(("l_quantity", "l_extendedprice")) - builtin._1) < 1e-6)
    assert(math.abs(ours(("l_quantity", "l_discount"))      - builtin._2) < 1e-6)
    assert(math.abs(ours(("l_extendedprice", "l_discount")) - builtin._3) < 1e-6)
    // exact decimal co-moments → identical r under any partitioning
    val re = Profiling.correlationMatrix(li.repartition(13), cols)
      .as[(String, String, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(re === ours)
  }
}
