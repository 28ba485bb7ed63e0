package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.JsonlCorpus

class JsonlSpec extends SparkSpec {
  import spark.implicits._

  test("JSONL roundtrip preserves the corpus") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text", "lang", "source")
    val path = Files.createTempDirectory("jsonl").toString
    JsonlCorpus.write(docs, path)
    val back = JsonlCorpus.read(spark, path)
      .as[(Long, String, String, String)].collect().toSet
    assert(back === docs.as[(Long, String, String, String)].collect().toSet)
  }

  test("gzip-sharded JSONL roundtrips identically; shards are .gz files") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text", "lang", "source")
    val path = Files.createTempDirectory("jsonl-gz").toString
    JsonlCorpus.write(docs, path, Some("gzip"))
    val shardNames = new java.io.File(path).listFiles()
      .map(_.getName).filter(_.startsWith("part-"))
    assert(shardNames.nonEmpty && shardNames.forall(_.endsWith(".json.gz")),
      s"expected gzip shards, got: ${shardNames.mkString(",")}")
    val back = JsonlCorpus.read(spark, path)
      .as[(Long, String, String, String)].collect().toSet
    assert(back === docs.as[(Long, String, String, String)].collect().toSet)
  }

  test("compaction reduces file count, preserves content, survives re-read") {
    import graft.operators.Compaction
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text", "lang", "source")
    val path = Files.createTempDirectory("compact").toString + "/t"
    docs.repartition(32).write.parquet(path)
    val before = docs.as[(Long, String, String, String)].collect().toSet

    val stats = Compaction.compact(spark, path)
    assert(stats.filesBefore === 32)
    assert(stats.filesAfter === stats.targetFiles && stats.filesAfter < 32)
    val after = spark.read.parquet(path)
      .as[(Long, String, String, String)].collect().toSet
    assert(after === before)
    // no residue from the swap
    val parent = new java.io.File(path).getParentFile.listFiles().map(_.getName)
    assert(!parent.exists(n => n.contains("compact_tmp") || n.contains("swap_old")),
      parent.mkString(","))
    // idempotent second pass: already at target → same file count, same rows
    val stats2 = Compaction.compact(spark, path)
    assert(stats2.filesAfter === stats.filesAfter)
    assert(spark.read.parquet(path).count() === before.size.toLong)
  }

  test("count parity does not skip an imbalanced directory (one huge + tiny files)") {
    import graft.operators.Compaction
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text", "lang", "source")
    val path = Files.createTempDirectory("compact-skew").toString + "/t"
    // one near-total-size file plus a sliver: two files
    docs.filter(col("doc_id") =!= 0L).coalesce(1).write.parquet(path)
    docs.filter(col("doc_id") === 0L).coalesce(1).write.mode("append").parquet(path)
    val files = new java.io.File(path).listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-")).map(_.length).sorted
    assert(files.length === 2 && files.last > files.head * 10,
      s"fixture must be skewed: ${files.mkString(",")}")
    // pick targetBytes so the computed target EQUALS the file count but
    // the big file is well past the 1.5x margin — the old count-parity
    // skip would have frozen this layout forever
    val total = files.sum
    val targetBytes = (total + 1) / 2
    assert(files.last > (targetBytes * 3) / 2)
    val before = docs.as[(Long, String, String, String)].collect().toSet
    val stats = Compaction.compact(spark, path, targetBytes = targetBytes)
    assert(stats.targetFiles === 2, "fixture arithmetic drifted")
    val rebalanced = new java.io.File(path).listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-")).map(_.length)
    assert(rebalanced.max <= (targetBytes * 3) / 2,
      s"rewrite must rebalance, got ${rebalanced.mkString(",")}")
    assert(spark.read.parquet(path)
      .as[(Long, String, String, String)].collect().toSet === before)
    // now balanced at target: the skip fires (no rewrite). The rewrite
    // changed compression (shuffled rows encode differently), so price
    // the second request off the NEW total
    val names = new java.io.File(path).listFiles().map(_.getName).toSet
    Compaction.compact(spark, path, targetBytes = (rebalanced.sum + 1) / 2)
    assert(new java.io.File(path).listFiles().map(_.getName).toSet === names,
      "balanced-at-target directory must not be rewritten again")
  }

  test("rangeBy compaction keeps per-file batch ranges disjoint (audit skipping survives)") {
    import graft.operators.Compaction
    // a batch-tracked table in its append-heavy natural state: many
    // small files per ingest batch, each file batch-constant
    val path = Files.createTempDirectory("compact-batch").toString + "/t"
    (0L to 4L).foreach { b =>
      spark.range(2000)
        .select(col("id"), lit(b).as("batch"),
          concat(lit("payload-"), col("id")).as("s"))
        .repartition(8).write.mode("append").parquet(path)
    }
    val stats = Compaction.compact(spark, path, targetBytes = 32 * 1024,
      rangeBy = Seq("batch"))
    assert(stats.filesAfter < stats.filesBefore, stats.toString)
    assert(spark.read.parquet(path).count() === 10000L)
    // each surviving file must cover a batch range DISJOINT from every
    // other file's (range partitioning never splits one batch value
    // across partitions) — the precondition for `batch > since` skipping
    // pre-audit files on footer min/max statistics alone
    val files = new java.io.File(path).listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-")).map(_.toString)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min(col("batch")), max(col("batch"))).head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    assert(ranges.length > 1, "need multiple files to demonstrate skipping")
    ranges.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) =>
        assert(loB > hiA, s"file batch ranges overlap: ${ranges.mkString(", ")}")
      case _ =>
    }
    // with the audit watermark inside the range, at least one file is
    // entirely pre-watermark (skippable) and at least one entirely post
    assert(ranges.exists(_._2 <= 2L) && ranges.exists(_._1 > 2L),
      ranges.mkString(", "))

    // idempotence: a second range-compaction of the untouched directory
    // is a metadata NO-OP — a scheduled `index compact` cron must not
    // pay a full rewrite when nothing changed (the _compact_range_state
    // fingerprint matches the listing it produced)
    val filesBefore2 = new java.io.File(path).listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-"))
      .map(f => f.getName -> f.lastModified()).toMap
    val stats2 = Compaction.compact(spark, path, targetBytes = 32 * 1024,
      rangeBy = Seq("batch"))
    assert(stats2.filesBefore === stats2.filesAfter, stats2.toString)
    val filesAfter2 = new java.io.File(path).listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-"))
      .map(f => f.getName -> f.lastModified()).toMap
    assert(filesAfter2 === filesBefore2,
      "no-op range compaction must not rewrite any file")

    // ...and an append AFTER the compaction perturbs the listing, so the
    // next run is a genuine rewrite again (skipping must never hide new
    // files from the range layout)
    spark.range(500)
      .select(col("id"), lit(5L).as("batch"),
        concat(lit("payload-"), col("id")).as("s"))
      .repartition(4).write.mode("append").parquet(path)
    val stats3 = Compaction.compact(spark, path, targetBytes = 32 * 1024,
      rangeBy = Seq("batch"))
    assert(stats3.filesAfter < stats3.filesBefore, stats3.toString)
    assert(spark.read.parquet(path).count() === 10500L)
    assert(spark.read.parquet(path).agg(max(col("batch"))).head.getLong(0) === 5L)
  }

  test("compaction refuses a partitioned table root") {
    import graft.operators.Compaction
    val path = Files.createTempDirectory("compact-part").toString + "/t"
    Tables.load(spark, sf0001, "documents")
      .select("doc_id", "lang").withColumn("b", col("doc_id") % 4)
      .write.partitionBy("b").parquet(path)
    val e = intercept[IllegalArgumentException](Compaction.compact(spark, path))
    assert(e.getMessage.contains("partition subdirectories"))
  }

  test("malformed and id-less lines are dropped and accounted") {
    val path = Files.createTempDirectory("jsonl-bad").toString
    Seq(
      """{"doc_id": 1, "text": "good", "lang": "en", "source": "a"}""",
      """{"doc_id": 2, "text": "also good"}""",
      """{"text": "no id"}""",
      """not json at all{{{"""
    ).toDF("value").coalesce(1).write.mode("overwrite").text(path)
    val good = JsonlCorpus.read(spark, path)
    assert(good.select("doc_id").as[Long].collect().toSet === Set(1L, 2L))
    val (goodCounted, bad) = JsonlCorpus.readCounting(spark, path)
    assert(goodCounted.count() === 2L)
    assert(bad === 2L)
  }
}
