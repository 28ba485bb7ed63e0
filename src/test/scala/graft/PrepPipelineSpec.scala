package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.pipeline.PrepPipeline

/** Unit-level twin of the q_prep_pipeline / q_prep_pipeline_staged gate
  * pair: the staged lineage materializes every boundary on disk and each
  * stage frame holds EXACTLY the unstaged stage's doc_id set. */
class PrepPipelineSpec extends SparkSpec {

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet

  test("stageTo materializes each boundary; staged stage frames == unstaged") {
    val d = Tables.load(spark, sf0001, "documents")
    val unstaged = PrepPipeline.stages(d, 0.5)
    val dir = Files.createTempDirectory("prepstage").toString
    val staged = PrepPipeline.stages(d, 0.5, PrepPipeline.stageTo(dir, d))
    val faces = Seq(
      ("1_quality", unstaged.quality, staged.quality),
      ("2_dedup", unstaged.deduped, staged.deduped),
      ("3_decontam", unstaged.clean, staged.clean))
    for ((name, un, st) <- faces) {
      assert(new java.io.File(s"$dir/$name").exists(), s"boundary $name not materialized")
      val (a, b) = (ids(un), ids(st))
      assert(a === b, s"stage $name: staged ids diverge from unstaged")
      // the boundary table itself carries the same population (narrow ids)
      assert(ids(spark.read.parquet(s"$dir/$name")) === a, s"boundary table $name")
    }
    // monotone attrition, ending non-empty on the fixture
    assert(ids(staged.clean).nonEmpty)
    assert(ids(staged.clean).subsetOf(ids(staged.deduped)))
    assert(ids(staged.deduped).subsetOf(ids(staged.quality)))
    // staged frames keep the corpus' full column surface
    assert(staged.clean.columns.sorted.toSeq === d.columns.sorted.toSeq)
  }

  test("stageTo resume: restart reuses completed boundaries; fingerprint invalidates") {
    val d = Tables.load(spark, sf0001, "documents")
    val dir = Files.createTempDirectory("prepresume").toString
    val fp = "j=0.5;corpus=sf0001"
    val freshClean = ids(
      PrepPipeline.stages(d, 0.5, PrepPipeline.stageTo(dir, d, resume = true, fp)).clean)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mtime(name: String): Long =
      fs.getFileStatus(new org.apache.hadoop.fs.Path(s"$dir/$name/_SUCCESS"))
        .getModificationTime

    // crash after stage 1: the later boundaries never landed
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/2_dedup"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/3_decontam"), true)
    val t1 = mtime("1_quality")
    Thread.sleep(1100) // mtime granularity
    val resumedClean = ids(
      PrepPipeline.stages(d, 0.5, PrepPipeline.stageTo(dir, d, resume = true, fp)).clean)
    assert(resumedClean === freshClean,
      "resumed build must hash-match the fresh build")
    assert(mtime("1_quality") === t1,
      "completed boundary must be reused, not recomputed")
    assert(mtime("2_dedup") > t1, "incomplete boundary must recompute")

    // a changed config fingerprint invalidates even completed boundaries
    Thread.sleep(1100)
    PrepPipeline.stages(d, 0.5, PrepPipeline.stageTo(dir, d, resume = true, "j=0.6"))
    assert(mtime("1_quality") > t1, "fingerprint mismatch must recompute")

    // resume = false (the default) always recomputes, marker or not
    val t1b = mtime("1_quality")
    Thread.sleep(1100)
    PrepPipeline.stages(d, 0.5, PrepPipeline.stageTo(dir, d))
    assert(mtime("1_quality") > t1b, "non-resume mode must always recompute")
  }

  test("dedupIngest: clean additions are slicing-invariant (one batch == two batches)") {
    import spark.implicits._
    import graft.dedup.DedupStore
    // store corpus + a delta containing an INTRA-batch near-dup pair
    // (20, 21) and a doc (22) near-duplicating stored content
    val mk = (id: Long, text: String) => (id, text)
    val storeCorpus = Seq(
      mk(1L, "the quick brown fox jumps over the lazy dog today"),
      mk(2L, "completely different content about spark query engines here")).toDF("doc_id", "text")
    val delta = Seq(
      mk(20L, "an original essay on distributed joins and shuffles now"),
      mk(21L, "an original essay on distributed joins and shuffles again"), // ≈ 20
      mk(22L, "the quick brown fox jumps over the lazy dog tonight"),       // ≈ stored 1
      mk(23L, "novel unrelated text with entirely fresh vocabulary words")).toDF("doc_id", "text")

    def cleanAdditions(slices: Seq[DataFrame]): Set[Long] = {
      val path = Files.createTempDirectory("ingestslice").toString
      DedupStore.writeSignatures(storeCorpus, path)
      slices.map(b => ids(PrepPipeline.dedupIngest(spark, path, b, 0.5)))
        .reduce(_ ++ _)
    }

    val oneBatch = cleanAdditions(Seq(delta))
    val twoBatches = cleanAdditions(Seq(
      delta.filter($"doc_id" <= 20L), delta.filter($"doc_id" > 20L)))
    // 21 must drop HOWEVER it arrives: same-batch as 20 (within-batch
    // pass) or a batch after 20 entered the store (store pass); 22 drops
    // against the stored doc 1 in both slicings
    assert(oneBatch === Set(20L, 23L), s"one-batch clean additions: $oneBatch")
    assert(twoBatches === oneBatch,
      s"slicing changed the answer: one=$oneBatch two=$twoBatches")
  }

  test("runPrepIngest: streamed file drops ≡ direct sequential dedupIngest calls") {
    import spark.implicits._
    import graft.dedup.DedupStore
    import graft.streaming.StreamRuntime
    val storeCorpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely different content about spark query engines here"))
      .toDF("doc_id", "text")
    val delta = Seq(
      (20L, "an original essay on distributed joins and shuffles now"),
      (21L, "an original essay on distributed joins and shuffles again"), // ≈ 20
      (22L, "the quick brown fox jumps over the lazy dog tonight"),       // ≈ stored 1
      (23L, "novel unrelated text with entirely fresh vocabulary words"))
      .toDF("doc_id", "text")
    val slices = Seq(delta.filter($"doc_id" <= 21L), delta.filter($"doc_id" > 21L))

    // direct sequential calls — the batch-at-a-time face
    val directPath = Files.createTempDirectory("ingeststream-direct").toString
    DedupStore.writeSignatures(storeCorpus, directPath)
    val direct = slices.map(b =>
      ids(PrepPipeline.dedupIngest(spark, directPath, b, 0.5))).reduce(_ ++ _)

    // the same slices as ordered file drops through the streaming runtime:
    // trigger 2 must dedup against the store AS GROWN by trigger 1
    val streamPath = Files.createTempDirectory("ingeststream-store").toString
    DedupStore.writeSignatures(storeCorpus, streamPath)
    val src = Files.createTempDirectory("ingeststream-src").toString
    StreamRuntime.orderedDrops(spark, slices, src)
    val streamed = ids(StreamRuntime.runPrepIngest(spark, src, streamPath, 0.5,
      Files.createTempDirectory("ingeststream-out").toString))

    // 21 drops within trigger 1 (near-dup of 20); 22 drops against the
    // stored doc 1 in trigger 2; 20 and 23 survive
    assert(streamed === Set(20L, 23L), s"streamed clean additions: $streamed")
    assert(streamed === direct,
      s"streaming changed the answer: direct=$direct streamed=$streamed")
    // ...and the store itself converged identically under both runtimes
    val directSigs = ids(spark.read.parquet(s"$directPath/sets"))
    val streamSigs = ids(spark.read.parquet(s"$streamPath/sets"))
    assert(streamSigs === directSigs,
      s"store drift: direct=$directSigs streamed=$streamSigs")

    // crash-replay e2e: re-run the WHOLE stream with a fresh streaming
    // checkpoint (every batch re-fires with the same ids) against the
    // already-ingested store and the same out dir — the per-batch
    // output overwrite plus store self-match stability must reproduce
    // the identical answer, not double it
    val replayed = ids(StreamRuntime.runPrepIngest(spark, src, streamPath, 0.5,
      Files.createTempDirectory("ingeststream-out").toString))
    assert(replayed === streamed,
      s"replayed stream changed the answer: first=$streamed replay=$replayed")
    assert(ids(spark.read.parquet(s"$streamPath/sets")) === streamSigs,
      "replayed stream mutated the store")
  }
}
