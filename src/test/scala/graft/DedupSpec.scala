package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "a b c d e f g h"),
    (2L, "a b c d e f g h"),             // exact dup of 1
    (3L, "a b c d e f g x"),             // near dup of 1 (shares 5 of 6+6 shingles)
    (4L, "q r s t u v w z"),             // unrelated
    (5L, "x y")                          // too short for 3-shingles
  ).toDF("doc_id", "text")

  test("exactDuplicates groups by digest with min-id survivor") {
    val m = Dedup.exactDuplicates(corpus).as[(String, Long, Long)].collect()
      .map(r => r._2 -> r._3).toMap
    assert(m(1L) === 2) // docs 1+2 collapse, survivor 1
    assert(m(3L) === 1)
    assert(!m.contains(2L))
  }

  test("shingles: distinct word 3-grams; short docs excluded") {
    val sh = Dedup.shingles(corpus).as[(Long, String)].collect()
    val byDoc = sh.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byDoc(1L) === Set("a b c", "b c d", "c d e", "d e f", "e f g", "f g h"))
    assert(!byDoc.contains(5L))
  }

  test("jaccardPairs finds exact and near dups with hand-computed jaccard") {
    val pairs = Dedup.jaccardPairs(Dedup.shingles(corpus), 0.4)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(pairs((1L, 2L)) === 1.0)
    // docs 1,3: inter = {a b c, b c d, c d e, d e f, e f g} = 5; union = 6+6-5 = 7
    assert(math.abs(pairs((1L, 3L)) - 5.0 / 7) < 1e-12)
    assert(math.abs(pairs((2L, 3L)) - 5.0 / 7) < 1e-12)
    assert(pairs.size === 3)
  }

  test("minhashLshPairs matches exact jaccardPairs on the fixture corpus") {
    val exact = Dedup.jaccardPairs(Dedup.shingles(corpus), 0.4)
      .as[(Long, Long, Double)].collect().toSet
    val lsh = Dedup.minhashLshPairs(Dedup.shingles(corpus), 0.4)
      .as[(Long, Long, Double)].collect().toSet
    assert(lsh === exact)
  }

  test("minhashLshPairs matches exact pairs on sf0.001 documents") {
    val sh = Dedup.shingles(Tables.load(spark, sf0001, "documents"))
    val exact = Dedup.jaccardPairs(sh, 0.5).as[(Long, Long, Double)].collect().toSet
    val lsh = Dedup.minhashLshPairs(sh, 0.5).as[(Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    assert(lsh === exact)
  }

  test("simhash: identical docs get identical hash; pairs are found") {
    val sim = Dedup.simhash64(corpus)
    val m = sim.as[(Long, Long)].collect().toMap
    assert(m(1L) === m(2L))
    val pairs = Dedup.simhashPairs(sim, 3).as[(Long, Long, Long)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0L))
  }

  test("shingleDfCap drops high-df shingles only") {
    val sh = Dedup.shingles(corpus)
    val capped = Dedup.shingleDfCap(sh, maxDf = 2)
    // every shingle here has df <= 3 ('a b c'..'e f g' appear in 3 docs)
    val dropped = sh.count() - capped.count()
    val df3 = sh.groupBy("shingle").count().filter($"count" > 2).count()
    assert(dropped === df3 * 3)
  }

  test("dedup-on-ingest: flags dups vs store, appends survivors, next batch sees them") {
    import graft.dedup.DedupStore
    val path = java.nio.file.Files.createTempDirectory("dedupstore").toString
    DedupStore.writeSignatures(corpus.filter($"doc_id" <= 2), path)

    // batch 1: doc 10 duplicates stored doc 1; doc 11 is novel
    val batch1 = Seq(
      (10L, "a b c d e f g h"),
      (11L, "m n o p q r s t")).toDF("doc_id", "text")
    val r1 = DedupStore.ingest(spark, path, batch1, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    // doc 10 matches BOTH stored copies (1 and 2), jaccard 1.0
    assert(r1 === Set((10L, 1L, 1.0), (10L, 2L, 1.0)))

    // batch 2: doc 20 duplicates doc 11 — which entered the store only via
    // batch 1's append; doc 21 duplicates the withheld dup 10 → NO match
    // (10 was never added, its content is already represented by 1/2...
    // but 21 carries that content, so it matches stored 1 and 2)
    val batch2 = Seq(
      (20L, "m n o p q r s t"),
      (21L, "a b c d e f g h")).toDF("doc_id", "text")
    val r2 = DedupStore.ingest(spark, path, batch2, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(r2.contains((20L, 11L, 1.0)), s"appended doc 11 not seen as dedup target: $r2")
    assert(r2.filter(_._1 == 21L).map(_._2) === Set(1L, 2L),
      s"doc 21 should match original store docs only (10 was withheld): $r2")
  }

  test("ingest replay is store-stable: a re-ingested batch matches its own signatures and adds nothing") {
    import graft.dedup.DedupStore
    val path = java.nio.file.Files.createTempDirectory("dedupreplay").toString
    DedupStore.writeSignatures(corpus.filter($"doc_id" <= 2), path)
    val batch = Seq(
      (10L, "m n o p q r s t"),
      (11L, "u v w x y z aa bb")).toDF("doc_id", "text")
    DedupStore.ingest(spark, path, batch, 0.5)
    val setsAfterFirst = spark.read.parquet(s"$path/sets")
      .select("doc_id").as[Long].collect().sorted.toSeq
    // a crash-replayed ingest of the SAME batch: every doc collides with
    // its own stored signature (jaccard 1.0), so nothing re-appends —
    // the property the streaming prep-ingest runtime's replay
    // discipline relies on
    val replay = DedupStore.ingest(spark, path, batch, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(replay.map(_._1) === Set(10L, 11L), s"replay not fully flagged: $replay")
    assert(replay.contains((10L, 10L, 1.0)) && replay.contains((11L, 11L, 1.0)),
      s"self-matches missing: $replay")
    val setsAfterReplay = spark.read.parquet(s"$path/sets")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(setsAfterReplay === setsAfterFirst,
      s"replay mutated the store: $setsAfterFirst -> $setsAfterReplay")
  }

  test("removeDocs purges a doc from the store so its near-dups are re-admitted") {
    import graft.dedup.DedupStore
    val path = java.nio.file.Files.createTempDirectory("dedupremove").toString
    DedupStore.writeSignatures(corpus.filter($"doc_id" <= 4), path)
    // purge docs 1 and 2 (the "a b c..." content); 3 and 4 survive
    DedupStore.removeDocs(spark, path, Seq(1L, 2L).toDF("doc_id"))
    // both signature tables physically clean — in the INSTALLED frame
    // (removeDocs commits via one manifest-frame flip; the superseded
    // legacy tables are retained one install as the readers' grace
    // window, so the root dirs still hold the old population by design)
    for (t <- Seq("sets", "buckets"))
      assert(spark.read.parquet(DedupStore.tablePath(spark, path, t))
        .filter($"doc_id".isin(1L, 2L)).count() == 0, s"$t not purged")
    assert(graft.operators.Frames.currentVersion(spark, path) === Some(0L),
      "removeDocs installs a manifest frame")
    // a new copy of the purged content is flagged ONLY against the
    // surviving near-dup (3), not the removed originals — and a copy of
    // removed-only content would sail through
    val r = DedupStore.ingest(spark, path,
        Seq((30L, "a b c d e f g h")).toDF("doc_id", "text"), 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(r.map(_._2) === Set(3L), s"expected match against survivor 3 only: $r")
    // idempotent: removing ids absent from the store changes nothing
    DedupStore.removeDocs(spark, path, Seq(1L, 99L).toDF("doc_id"))
    assert(spark.read.parquet(DedupStore.tablePath(spark, path, "sets")).count() ===
      corpus.filter($"doc_id".isin(3L, 4L, 30L)).count())
  }

  test("removeDocs frame install: kill mid-stage costs nothing; retention keeps one superseded frame") {
    import graft.dedup.DedupStore
    import graft.operators.Frames
    val path = java.nio.file.Files.createTempDirectory("dedupframe").toString
    DedupStore.writeSignatures(corpus.filter($"doc_id" <= 4), path)

    // forge a removeDocs killed BETWEEN its two staged rewrites: one
    // poisoned generation staged, the pointer never flipped — readers
    // must never look past the pointer (VERDICT r18 #1: the r18 shape's
    // sequential swaps were torn apart by exactly this kill)
    Seq((999L, Seq("zz"))).toDF("doc_id", "sh_set")
      .write.mode("overwrite").parquet(s"$path/tables/sets/g=0")
    assert(Frames.currentVersion(spark, path) === None)
    assert(DedupStore.tablePath(spark, path, "sets") === s"$path/sets",
      "an unflipped staged generation is invisible to every reader")
    assert(DedupStore.checkStore(spark, path)
      .agg(sum($"violations")).as[Long].collect().head === 0L,
      "fsck audits the OLD frame through the crash window")
    // ...and ingest still dedups against the complete old population
    val r = DedupStore.ingest(spark, path,
        Seq((40L, "a b c d e f g h")).toDF("doc_id", "text"), 0.5)
      .as[(Long, Long, Double)].collect()
    assert(r.map(_._2).toSet === Set(1L, 2L, 3L))

    // the re-run restages over the debris and commits BOTH rewrites
    // with ONE pointer flip
    DedupStore.removeDocs(spark, path, Seq(1L, 2L).toDF("doc_id"))
    assert(Frames.currentVersion(spark, path) === Some(0L))
    for (t <- Seq("sets", "buckets"))
      assert(spark.read.parquet(DedupStore.tablePath(spark, path, t))
        .filter($"doc_id".isin(1L, 2L)).count() === 0L, s"$t not purged")
    assert(DedupStore.checkStore(spark, path)
      .agg(sum($"violations")).as[Long].collect().head === 0L)
    // retention (VERDICT r18 #2): the superseded legacy frame survives
    // one install as the external readers' grace window
    assert(new java.io.File(s"$path/sets").exists,
      "the previous (legacy) frame is retained for one install")

    // a reader that resolved its dirs JUST BEFORE the next install
    // completes its scan against the retained frame...
    val preInstall = DedupStore.tablePath(spark, path, "sets")
    DedupStore.removeDocs(spark, path, Seq(3L).toDF("doc_id")) // v=1
    assert(spark.read.parquet(preInstall).count() > 0,
      "retain=1: the pre-install generation still reads after one flip")
    assert(!new java.io.File(s"$path/sets").exists,
      "the legacy frame left the retention window at the second install")
    // ...but only one install's worth: the second flip sweeps it
    val v1gen = DedupStore.tablePath(spark, path, "sets") // v=1's generation
    DedupStore.removeDocs(spark, path, Seq(4L).toDF("doc_id")) // v=2
    assert(!new java.io.File(preInstall).exists,
      "two installs later the grace window has passed")

    // reclaim-now: Maintain's gc verb with retain=0 sweeps the one
    // remaining superseded frame immediately
    assert(new java.io.File(v1gen).exists, "retain=1 keeps v=1's generation")
    Maintain.run(spark, "dedup", "gc", path, Seq("0"))
    assert(!new java.io.File(v1gen).exists)
    assert(spark.read.parquet(DedupStore.tablePath(spark, path, "sets"))
      .select("doc_id").as[Long].collect().isEmpty,
      "v=2 removed every doc: 1,2,3,4 purged and 5 was too short to store")

    // rebuilding OVER a frame-installed store is refused loudly — the
    // root-dir overwrite would be invisible behind the pointer
    val eRebuild = intercept[IllegalArgumentException](
      DedupStore.writeSignatures(corpus, path))
    assert(eRebuild.getMessage.contains("frame-installed"), eRebuild.getMessage)
  }

  test("checkStore: healthy lifecycle store passes; sets/buckets drift detected") {
    import graft.dedup.DedupStore
    val path = java.nio.file.Files.createTempDirectory("dedupfsck").toString
    DedupStore.writeSignatures(corpus.filter($"doc_id" <= 4), path)
    DedupStore.removeDocs(spark, path, Seq(2L).toDF("doc_id"))
    DedupStore.ingest(spark, path, Seq((30L, "m n o p q r s t")).toDF("doc_id", "text"), 0.5)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    def report(): Map[String, (Long, Long)] =
      DedupStore.checkStore(spark, path)
        .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

    // store holds 1, 3, 4 (2 removed; 5 too short to shingle) + ingested 30
    val healthy = report()
    assert(healthy.size === 4)
    assert(healthy.values.forall(_._2 == 0L), s"healthy store has violations: $healthy")
    assert(healthy("ids_unique")._1 === 4L)
    assert(healthy("id_surface_match")._1 === 4L)
    assert(healthy("bucket_cardinality")._1 === 4L)
    assert(healthy("buckets_match_signatures")._1 === 4L * 32)

    // the ingest crash window's drift shape: sets rewritten, buckets
    // not — the dropped doc's buckets are orphans on BOTH the surface
    // and content invariants, nothing else flagged (forged against the
    // RESOLVED sets dir: this store is frame-installed after removeDocs)
    val liveSets = DedupStore.tablePath(spark, path, "sets")
    spark.read.parquet(liveSets).filter($"doc_id" =!= 3L)
      .write.mode("overwrite").parquet(s"$path/sets_tmp")
    graft.FsOps.atomicSwap(fs, new org.apache.hadoop.fs.Path(liveSets),
      new org.apache.hadoop.fs.Path(s"$path/sets_tmp"))
    val drifted = report()
    assert(drifted("id_surface_match")._2 === 1L)
    assert(drifted("buckets_match_signatures")._2 === 32L)
    assert(drifted("bucket_cardinality")._2 === 0L && drifted("ids_unique")._2 === 0L)

    // repair = refreshBuckets (re-derive buckets from the surviving
    // sets, the authoritative table); report clean again
    DedupStore.refreshBuckets(spark, path)
    assert(report().values.forall(_._2 == 0L), "refreshBuckets must repair the drift")
  }

  test("checkStoreIncremental audits the ingest delta only; crash drift flagged") {
    import graft.dedup.DedupStore
    val path = java.nio.file.Files.createTempDirectory("dedupincr").toString
    DedupStore.writeSignatures(
      Seq((1L, "a b c d e f g h"), (2L, "q r s t u v w x")).toDF("doc_id", "text"), path)
    assert(DedupStore.lastBatch(spark, path) === Some(0L))
    DedupStore.markAudited(spark, path) // deep audit vouched for batch 0
    // batch 1: 10 near-duplicates stored doc 1 (withheld), 11 is novel
    val r = DedupStore.ingest(spark, path,
      Seq((10L, "a b c d e f g z"), (11L, "m n o p h i j k")).toDF("doc_id", "text"), 0.5)
    assert(r.select("new_id").as[Long].collect().toSet === Set(10L))
    assert(DedupStore.lastBatch(spark, path) === Some(1L))

    def report(): Map[String, (Long, Long)] =
      DedupStore.checkStoreIncremental(spark, path)
        .as[(String, Long, Long)].collect().map(x => x._1 -> (x._2, x._3)).toMap

    val clean = report()
    assert(clean.size === 4)
    assert(clean.values.forall(_._2 == 0L), s"clean delta has violations: $clean")
    // the delta is exactly the one SURVIVING ingested doc
    assert(clean("delta_ids_unique") === ((1L, 0L)))
    assert(clean("delta_buckets_match_signatures") === ((32L, 0L)))

    // ingest's crash window INSIDE the delta: a sets append that
    // committed while the buckets append was lost (simulated at batch 2)
    spark.read.parquet(s"$path/sets").limit(1)
      .withColumn("doc_id", lit(12L)).withColumn("batch", lit(2L))
      .write.mode("append").parquet(s"$path/sets")
    val drifted = report()
    assert(drifted("delta_id_surface_match")._2 === 1L)
    assert(drifted("delta_buckets_match_signatures")._2 === 32L)

    // the SAME drift in the vouched-for batch 0 is deep-audit scope
    // (full checkStore flags it; the incremental report must not change)
    spark.read.parquet(s"$path/sets").filter($"doc_id" === 1L)
      .write.mode("append").parquet(s"$path/sets")
    assert(report()("delta_ids_unique")._2 === 0L,
      "batch-0 corruption must stay out of the incremental scope")

    // repair re-derives buckets from sets (batch re-attached), the
    // batch-0 duplicate is removed, and the advanced watermark empties
    // the next incremental audit
    DedupStore.removeDocs(spark, path, Seq(1L).toDF("doc_id"))
    DedupStore.refreshBuckets(spark, path)
    assert(report().values.forall(_._2 == 0L), "repair must restore the delta invariants")
    DedupStore.markAudited(spark, path, upTo = Some(2L))
    assert(report()("delta_ids_unique")._1 === 0L)
  }

  test("geometry marker: mismatched numHashes/bands fail fast on every store op") {
    import graft.dedup.DedupStore
    val path = java.nio.file.Files.createTempDirectory("dedupgeom").toString
    DedupStore.writeSignatures(corpus.filter($"doc_id" <= 4), path,
      numHashes = 64, bands = 16)
    assert(DedupStore.storedGeometry(spark, path) === Some((64, 16)))
    // the DEFAULT geometry (128/32) now contradicts the store's marker —
    // every op that derives or validates buckets must refuse, not
    // silently rewrite/check with the wrong geometry
    val batch = Seq((30L, "m n o p q r s t")).toDF("doc_id", "text")
    for (op <- Seq(
      () => DedupStore.ingest(spark, path, batch, 0.5),
      () => DedupStore.checkStore(spark, path),
      () => DedupStore.refreshBuckets(spark, path))) {
      val e = intercept[IllegalArgumentException](op())
      assert(e.getMessage.contains("geometry"), e.getMessage)
    }
    // the recorded geometry works end to end
    val r = DedupStore.ingest(spark, path, batch, 0.5,
      numHashes = 64, bands = 16)
    assert(r.count() === 0)
    assert(DedupStore.checkStore(spark, path, numHashes = 64, bands = 16)
      .filter($"violations" =!= 0L).count() === 0)
  }

  test("duplicateClusters: transitive components, min-id survivor") {
    // chain 1-2-3 plus isolated pair 5-6; 8 links back to 1 (A≈B≈C shape)
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (1L, 8L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.duplicateClusters(pairs)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 1L, 1L), (2L, 1L, 0L), (3L, 1L, 0L), (8L, 1L, 0L),
      (5L, 5L, 1L), (6L, 5L, 0L)))
  }

  test("streaming dedup-on-ingest: later micro-batches dedup against all earlier ones") {
    import graft.dedup.DedupStore
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val scratch = java.nio.file.Files.createTempDirectory("streamdedup").toString
    val store = s"$scratch/store"
    val mem = MemoryStream[(Long, String)]
    val q = DedupStore.writeIngesting(
      mem.toDF().toDF("doc_id", "text"), store, 0.5, s"$scratch/ckpt")
    try {
      mem.addData((1L, "a b c d e f g h"), (2L, "q r s t u v w z"))
      q.processAllAvailable() // bootstrap batch
      mem.addData((10L, "a b c d e f g h"), (11L, "m n o p q r s t"))
      q.processAllAvailable() // 10 dups stored 1; 11 novel -> appended
      mem.addData((20L, "m n o p q r s t"))
      q.processAllAvailable() // 20 dups 11, which arrived via the STREAM
      val reports = spark.read.parquet(s"$store/reports")
        .select("new_id", "dup_of").as[(Long, Long)].collect().toSet
      assert(reports === Set((10L, 1L), (20L, 11L)), s"got $reports")
    } finally q.stop()
  }

  test("embedding near-dup: cosine of identical vectors is 1") {
    val e = Seq((1L, Array(1.0f, 2.0f, 3.0f)), (2L, Array(1.0f, 2.0f, 3.0f)),
      (3L, Array(-3.0f, 1.0f, 0.5f))).toDF("vec_id", "embedding")
    // identical vectors share every band bucket, so the LSH path finds
    // them with probability 1, independent of the plane family
    val pairs = Dedup.embeddingNearDupPairs(e, 0.99, bands = 4, bandBits = 2, dim = 3)
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    assert(math.abs(pairs.head._3 - 1.0) < 1e-12)
  }

  test("autoBandBits bounds bucket occupancy; auto face degenerates to 16x4 at gate scale") {
    import graft.dedup.Dedup.{autoBandBits, autoBands, autoGeometry}
    // the rule: clamp(ceil(log2(n / 128)), 4, 12) — candidate pairs are
    // quadratic in per-bucket occupancy, so the width must grow with n
    assert(autoBandBits(500) === 4)    // sf0.01 gate corpus
    assert(autoBandBits(2000) === 4)   // sf0.1 bench corpus
    assert(autoBandBits(20000) === 8)  // 10x
    assert(autoBandBits(60000) === 9)  // 30x
    assert(autoBandBits(1L << 40) === 12, "clamped: bands buy recall past here")
    // ...and autoBands buys the recall back (VERDICT r17 #4): the exact
    // banded-LSH inversion, whose fixed point at the gate geometry
    // (minCos 0.5, 4 bits, R 0.97) is EXACTLY the historical 16 bands
    assert(autoBands(0.5, 0.97, 4) === 16)
    assert(autoBands(0.5, 0.97, 9, maxBands = 1024) === 134,
      "wider bands demand more of them")
    // the COST CEILING: full recall at a low threshold + wide bands is
    // intrinsically unaffordable (134 bands at 60k vectors = the
    // measured OOM) — the default clamps and the artifact emits the
    // honest achieved recall at the boundary
    assert(autoBands(0.5, 0.97, 9) === 64)
    val clamped = graft.dedup.Dedup.recallAtMinCos(0.5, 9, 64)
    assert(clamped > 0.80 && clamped < 0.97, s"ceiling-bound recall: $clamped")
    assert(autoBands(0.8, 0.97, 8) === 21,
      "high-similarity thresholds stay cheap at wide bands — no ceiling")
    assert(autoGeometry(500, 0.5) === ((4, 16)))
    assert(autoGeometry(2048, 0.5) === ((4, 16)))
    // the auto face IS embeddingNearDupPairs at the derived geometry
    // (the fixture's pair mass lives in the 0.3 tail, so compare there:
    // n = 500 → 4 bits, and 0.3 at R 0.97 demands 26 bands)
    val e = Tables.load(spark, sf0001, "embeddings")
    assert(autoGeometry(500, 0.3) === ((4, 26)))
    val auto = Dedup.embeddingNearDupPairsAuto(e, 0.3)
      .as[(Long, Long, Double)].collect().toSet
    val derived = Dedup.embeddingNearDupPairs(e, 0.3, bands = 26, bandBits = 4)
      .as[(Long, Long, Double)].collect().toSet
    assert(auto === derived)
    assert(auto.nonEmpty)
  }

  test("the past-the-envelope verify path answers identically to the broadcast path") {
    import graft.dedup.Dedup
    // corpora past the 64 MB broadcast envelope re-hash the candidate
    // pairs at the scaled width instead of broadcasting the vectors —
    // force that branch on the small fixture by planting a geometry
    // whose n claims ~10M vectors (only the n/expectedCandidates fields
    // steer the plan; bands/bits are passed explicitly) and prove the
    // wide-plan answers are bit-identical to the broadcast plan's
    val e = Tables.load(spark, sf0001, "embeddings")
    val big = Dedup.PlannedGeometry(10L * 1000 * 1000, 4, 26,
      0.97, 0.97, ceilingBound = false)
    assert(!(big.n * (4L * 64 + 24L) <= (64L << 20)),
      "forged n must sit past the broadcast envelope")
    val wide = Dedup.embeddingNearDupPairs(e, 0.3, bands = 26, bandBits = 4,
        planned = Some(big)).as[(Long, Long, Double)].collect().toSet
    val bcast = Dedup.embeddingNearDupPairs(e, 0.3, bands = 26, bandBits = 4)
      .as[(Long, Long, Double)].collect().toSet
    assert(wide === bcast)
    assert(wide.nonEmpty)
  }

  test("planGeometry surfaces the ceiling-bound recall signal exactly when the ceiling binds") {
    import graft.dedup.Dedup
    import graft.dedup.Dedup.AutoTune
    // VERDICT r18 #4: production callers must SEE the degraded recall
    // when the maxBands cost ceiling clamps, not only the bench
    // artifact. The signal fires exactly when autoBands would have
    // demanded more bands than the ceiling allows — never otherwise.
    val bound = Dedup.planGeometry(60000, 0.5) // 9 bits, wants 134 bands
    assert(bound.bits === 9 && bound.bands === 64)
    assert(bound.ceilingBound, "134 > 64: the ceiling binds")
    assert(bound.recallAtMinCos < bound.targetRecall,
      s"bound recall ${bound.recallAtMinCos} must sit below the 0.97 target")
    assert(math.abs(bound.recallAtMinCos -
      Dedup.recallAtMinCos(0.5, 9, 64)) < 1e-12)
    assert(bound.expectedCandidates > 0L)
    val free = Dedup.planGeometry(2048, 0.5) // gate scale: 4 bits, 16 bands
    assert(free.bits === 4 && free.bands === 16)
    assert(!free.ceilingBound, "16 <= 64: no ceiling, no signal")
    assert(free.recallAtMinCos >= free.targetRecall,
      "unclamped geometry meets the target at the boundary by construction")
    // a raised ceiling un-binds the same corpus
    val raised = Dedup.planGeometry(60000, 0.5, AutoTune(maxBands = 1024))
    assert(raised.bands === 134 && !raised.ceilingBound)
    // the Planned face returns pairs AND the signal; the plain auto face
    // is literally its first element (same plan, same geometry)
    val e = Tables.load(spark, sf0001, "embeddings")
    val (pairs, g) = Dedup.embeddingNearDupPairsAutoPlanned(e, 0.3)
    assert(g.bits === 4 && g.bands === 26 && !g.ceilingBound)
    assert(pairs.columns.toSeq === Seq("id_a", "id_b", "cos"))
    // volume-scaled pair-dedup width (VERDICT r18 #3): at gate scale the
    // estimate stays under one session-width partition's worth, so the
    // plan is unchanged; the width only grows when the volume does
    assert(g.expectedCandidates === (26.0 * 500.0 * (500.0 / 16) / 2).toLong)
  }

  test("autoBands recall property: measured recall >= target at two thresholds") {
    // VERDICT r17 #4 done-criterion: on a SEEDED corpus with planted
    // near-dup pairs (the fixture embeddings carry almost no pairs
    // above cos 0.5 — their pair mass is the 0.3 tail), the recall-
    // tuned band count at a WIDE band width (bits = 8, the 10x-scale
    // width) recovers at least the target fraction of the brute-force
    // pair set. Everything is deterministic — seeded RNG, md5-derived
    // planes — so this is a fixed number, not a flaky sample.
    // Candidates are exact-verified, so lsh ⊆ brute and recall is the
    // size ratio; the guarantee is AT the minCos boundary and planted
    // pairs sit just above it, so this measures the curve's worst case.
    val rnd = new scala.util.Random(42)
    val dim = 64
    def unit(): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val target = 0.97
    for (minCos <- Seq(0.5, 0.8)) {
      // 300 base vectors, each with a twin perturbed to land just above
      // the boundary: v' = normalize(cosT·v + sinT·u⊥), cosT = minCos+0.03
      val cosT = minCos + 0.03
      val sinT = math.sqrt(1 - cosT * cosT)
      val rows = (0 until 300).flatMap { i =>
        val v = unit()
        val u0 = unit()
        val d = (v, u0).zipped.map(_ * _).sum.toDouble
        val perp = u0.zip(v).map { case (ux, vx) => ux - (d * vx).toFloat }
        val np = math.sqrt(perp.map(x => x * x).sum)
        val tw = v.zip(perp).map { case (vx, px) =>
          (cosT * vx + sinT * px / np).toFloat }
        Seq((i.toLong * 2, v), (i.toLong * 2 + 1, tw))
      }
      val e = rows.toDF("vec_id", "embedding")
      val brute = Dedup.embeddingNearDupPairsBrute(e, minCos)
        .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
      assert(brute.size >= 300, s"planted pairs must survive at cos >= $minCos")
      // ceiling lifted: the property validates the INVERSION (bands →
      // recall), not the cost envelope the default ceiling enforces
      val bands = Dedup.autoBands(minCos, target, bits = 8, maxBands = 1024)
      val lsh = Dedup.embeddingNearDupPairs(e, minCos,
          bands = bands, bandBits = 8)
        .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
      assert(lsh.subsetOf(brute), "verified candidates: no false positives")
      assert(lsh.size >= brute.size * target,
        s"recall ${lsh.size}/${brute.size} below $target at minCos=$minCos " +
          s"(bands=$bands, bits=8)")
    }
  }

  test("bucketed embedding near-dup is a verified subset of brute force") {
    val e = Tables.load(spark, sf0001, "embeddings")
    val brute = Dedup.embeddingNearDupPairsBrute(e, 0.3)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    val lsh = Dedup.embeddingNearDupPairs(e, 0.3)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(brute.nonEmpty, "fixture should contain pairs at cos >= 0.3")
    assert(lsh.subsetOf(brute), "LSH candidates are exact-verified, so no false positives")
    // 16 bands x 4 bits: recall ~0.97 at cos 0.5, lower but substantial
    // in the 0.3 tail; the deterministic planes make this a fixed number.
    assert(lsh.size >= (brute.size * 0.5).toInt,
      s"recall collapsed: ${lsh.size}/${brute.size}")
  }
}
