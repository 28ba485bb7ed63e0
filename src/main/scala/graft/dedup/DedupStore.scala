package graft.dedup

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dedup-on-ingest: near-duplicate detection of a NEW batch against an
  * already-processed corpus, without recomputing the corpus — the shape a
  * continuously-growing training-data pipeline actually needs ("dedup
  * today's crawl against everything we already kept").
  *
  * State is a persisted MinHash store with two tables:
  *
  *   - `buckets` — `(doc_id, band, bucket)` LSH band buckets (the join
  *     index; ~bands rows per doc, never the text);
  *   - `sets`    — `(doc_id, sh_set)` shingle sets (for exact Jaccard
  *     verification of candidates).
  *
  * Scale design (100 TB corpus, daily batches):
  *   - [[ingest]]'s only wide work is proportional to the NEW batch: its
  *     buckets shuffle-join the stored buckets on `(band, bucket)` — the
  *     stored side is scanned but only colliding groups produce rows —
  *     then candidates (typically ≪ batch size) join the two `sets`
  *     tables by doc id for exact verification.
  *   - The store grows append-only; nothing is rewritten.
  *   - Candidate precision is exact (verified Jaccard ≥ τ); recall is the
  *     LSH curve — identical to [[Dedup.minhashLshPairs]], whose 128/32
  *     geometry this store shares by default.
  */
object DedupStore {

  /** The buckets-table derivation from a shingle-sets frame — ONE
    * definition shared by every producer (initial build, ingest staging,
    * fsck recompute, repair), so the geometry/derivation can never
    * diverge between the store's writers and its checker. */
  private def deriveBuckets(sets: DataFrame,
                            numHashes: Int, bands: Int): DataFrame =
    Dedup.lshBuckets(Dedup.withMinhashSignature(sets, numHashes), numHashes, bands)

  // ---- geometry marker: the store records its own (numHashes, bands) so
  // a later ingest/fsck/repair invoked with different params fails fast
  // instead of silently mixing geometries (mismatched buckets collide on
  // the wrong bands and quietly lose recall — and a checker called with
  // the same wrong params would then report the broken store clean). The
  // same fail-safe discipline as Indexer's `_nbuckets`.

  private val GeometryMarker = "_geometry"

  private def writeGeometry(spark: SparkSession, path: String,
                            numHashes: Int, bands: Int): Unit =
    graft.FsOps.writeMarker(spark, path, GeometryMarker, s"$numHashes,$bands")

  /** The `(numHashes, bands)` geometry a store was built with, if
    * recorded (stores written before the marker existed have none). */
  def storedGeometry(spark: SparkSession, path: String): Option[(Int, Int)] =
    graft.FsOps.readMarker(spark, path, GeometryMarker).map { s =>
      val parts = s.trim.split(",")
      try (parts(0).toInt, parts(1).toInt)
      catch { case _: RuntimeException =>
        throw new IllegalStateException(
          s"corrupt marker $path/$GeometryMarker: '${s.trim}' is not " +
            "'<numHashes>,<bands>' — delete the file to reset it")
      }
    }

  /** Fail fast when the caller's geometry contradicts the store's
    * recorded one (pre-marker stores validate vacuously). */
  private def requireGeometry(spark: SparkSession, path: String,
                              numHashes: Int, bands: Int, op: String): Unit =
    storedGeometry(spark, path).foreach { case (nh, b) =>
      require(nh == numHashes && b == bands,
        s"$op: store at $path was built with geometry numHashes=$nh, bands=$b " +
          s"but was invoked with numHashes=$numHashes, bands=$bands — mixed " +
          "geometries silently lose recall; pass the stored geometry " +
          "(DedupStore.storedGeometry) or rebuild the store")
    }

  // ---- ingest-batch bookkeeping (the dedup face of the index store's
  // `_lastbatch`/`_last_audit` discipline): every sets/buckets row
  // carries the ingest-batch ordinal that wrote it (constant per parquet
  // file — an incremental audit's `batch > since` filter skips pre-audit
  // files via min/max statistics), `_lastbatch` tracks the highest
  // ordinal written, `_last_audit` the highest one an audit vouched for.

  /** Shingle size the store was built with. Unlike (numHashes, bands)
    * it is INVISIBLE in the table schemas — sets of 3-shingles and
    * 5-shingles look identical — so it gets its own marker: a verify
    * point for [[ingest]] (a mismatched batch would compute Jaccard
    * against incomparable sets) and a merge guard ([[mergeStores]] is
    * exactly where independently-configured builds meet). Stores
    * written before the marker existed validate vacuously on ingest
    * but REFUSE to merge (the risk is silent dedup corruption). */
  private val ShingleMarker = "_shingle_n"

  private val LastBatchMarker = "_lastbatch"
  private val LastAuditMarker = "_last_audit"

  private def writeLongMarker(spark: SparkSession, path: String,
                              marker: String, v: Long): Unit =
    graft.FsOps.writeLongMarker(spark, path, marker, v)

  private def readLongMarker(spark: SparkSession, path: String,
                             marker: String): Option[Long] =
    graft.FsOps.readLongMarker(spark, path, marker)

  /** Highest ingest-batch ordinal recorded (None = pre-tracking store). */
  def lastBatch(spark: SparkSession, path: String): Option[Long] =
    readLongMarker(spark, path, LastBatchMarker)

  /** Highest batch an audit has vouched for (None = never audited). */
  def lastAudited(spark: SparkSession, path: String): Option[Long] =
    readLongMarker(spark, path, LastAuditMarker)

  /** Record that every batch up to `upTo` (default: the current last)
    * has been audited. Not advanced by the checkers themselves — an
    * audit that mutates the store it audits would make a red report
    * unrepeatable (same contract as the other stores'). */
  def markAudited(spark: SparkSession, path: String,
                  upTo: Option[Long] = None): Unit = {
    val v = upTo.orElse(lastBatch(spark, path)).getOrElse(
      throw new IllegalStateException(s"markAudited: no batch marker at $path — " +
        "a pre-batch-tracking store has nothing to scope an incremental audit to"))
    writeLongMarker(spark, path, LastAuditMarker, v)
  }

  /** Build the signature store for an initial corpus. Shingle sets are
    * persisted FIRST and the signatures/buckets derive from the persisted
    * copy — computing both from the original lineage would run the whole
    * tokenize/shingle/collect chain twice. */
  def writeSignatures(corpus: DataFrame, path: String,
                      idCol: String = "doc_id", textCol: String = "text",
                      shingleN: Int = 3, numHashes: Int = 128, bands: Int = 32): Unit = {
    val sets = Dedup.shingleSets(Dedup.shingles(corpus, idCol, textCol, shingleN))
    sets.withColumn("batch", lit(0L))
      .write.mode("overwrite").parquet(s"$path/sets")
    val stored = corpus.sparkSession.read.parquet(s"$path/sets")
    deriveBuckets(stored, numHashes, bands)
      .withColumn("batch", lit(0L))
      .write.mode("overwrite").parquet(s"$path/buckets")
    writeGeometry(corpus.sparkSession, path, numHashes, bands)
    writeLongMarker(corpus.sparkSession, path, ShingleMarker, shingleN.toLong)
    writeLongMarker(corpus.sparkSession, path, LastBatchMarker, 0L)
  }

  /** Dedup a new batch against the store, then grow the store.
    *
    * Returns `(new_id, dup_of, jaccard)`: every new document whose true
    * Jaccard similarity to some STORED document reaches `minJaccard`
    * (a new doc can match several stored docs — one row each, like the
    * pair-listing dedup operators). Documents with no match are appended
    * to the store (buckets + sets) and become the dedup target for the
    * next batch; flagged duplicates are not added.
    *
    * The duplicate report is materialized to `path/_last_ingest` BEFORE
    * the store grows — the report must not observe the rows it caused to
    * be appended (and a re-read after append would).
    */
  def ingest(spark: SparkSession, path: String, newBatch: DataFrame,
             minJaccard: Double,
             idCol: String = "doc_id", textCol: String = "text",
             shingleN: Int = 3, numHashes: Int = 128, bands: Int = 32): DataFrame = {
    graft.FsOps.requireNotHusk(spark, path) // consumed shard: pointed refusal
    requireGeometry(spark, path, numHashes, bands, "ingest")
    readLongMarker(spark, path, ShingleMarker).foreach { n =>
      require(n == shingleN.toLong,
        s"ingest shingleN=$shingleN does not match the store's recorded " +
          s"shingle size $n at $path — Jaccard over mismatched shingle " +
          "sizes silently mis-dedups")
    }
    // stage the batch's sets/buckets once: they are each consumed by
    // several jobs below (candidate join, verification, survivor append),
    // and every consumer would otherwise re-run the shingle chain
    val staged = s"$path/_ingest_staging"
    Dedup.shingleSets(Dedup.shingles(newBatch, idCol, textCol, shingleN))
      .write.mode("overwrite").parquet(s"$staged/sets")
    val newSets = spark.read.parquet(s"$staged/sets")
    deriveBuckets(newSets, numHashes, bands)
      .write.mode("overwrite").parquet(s"$staged/buckets")
    val newBuckets = spark.read.parquet(s"$staged/buckets")

    val storedBuckets = spark.read.parquet(s"$path/buckets")
    val storedSets = spark.read.parquet(s"$path/sets")

    // candidates: any band-bucket collision between the batch and the store
    val cand = newBuckets.select(col("doc_id").as("new_id"), col("band"), col("bucket"))
      .join(storedBuckets.select(col("doc_id").as("dup_of"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .select("new_id", "dup_of")
      .distinct()

    // exact verification on the full shingle sets
    val dups = cand
      .join(newSets.select(col("doc_id").as("new_id"), col("sh_set").as("set_a")), "new_id")
      .join(storedSets.select(col("doc_id").as("dup_of"), col("sh_set").as("set_b")), "dup_of")
      .withColumn("n_inter", size(array_intersect(col("set_a"), col("set_b"))))
      .withColumn("jaccard", col("n_inter").cast("double") /
        (size(col("set_a")) + size(col("set_b")) - col("n_inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("new_id"), col("dup_of"), col("jaccard"))

    dups.write.mode("overwrite").parquet(s"$path/_last_ingest")
    val report = spark.read.parquet(s"$path/_last_ingest")

    val dupIds = report.select(col("new_id").as("doc_id")).distinct()
    // survivors land under the next ingest-batch ordinal (legacy stores
    // without the marker stay untagged — no mixed schemas); the marker
    // advances LAST, so a crash mid-append leaves the landed rows under
    // a not-yet-vouched-for ordinal the next incremental audit covers
    val batchId = lastBatch(spark, path).map(_ + 1)
    def tag(df: DataFrame): DataFrame =
      batchId.map(b => df.withColumn("batch", lit(b))).getOrElse(df)
    tag(newSets.join(dupIds, Seq("doc_id"), "left_anti"))
      .write.mode("append").parquet(s"$path/sets")
    tag(newBuckets.join(dupIds, Seq("doc_id"), "left_anti"))
      .write.mode("append").parquet(s"$path/buckets")
    batchId.foreach(b => writeLongMarker(spark, path, LastBatchMarker, b))
    new Path(staged).getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new Path(staged), true)
    report
  }

  /** Merge N independently-built signature stores into one — the dedup
    * face of the shard-build-then-promote pattern
    * ([[graft.index.StoreMerge]] / [[graft.similarity.IvfStore
    * .mergeStores]] are the BM25/ANN faces). MinHash signatures and LSH
    * band buckets are DETERMINISTIC functions of each doc alone, so two
    * stores built with the same `(numHashes, bands)` geometry union by
    * pure FILE TRANSFER — no shingle re-hashed, no row rewritten — and
    * the merged store immediately dedups ingest batches against BOTH
    * shards' content (the cross-shard near-dups neither shard could see
    * are exactly what the promotion buys). Contracts: ≥ 2 sources,
    * identical geometry markers, identical table schemas, batch-tracked
    * sources, DISJOINT doc_id spaces on the raw sets. Commit point: the
    * destination geometry marker, written last ([[ingest]] refuses a
    * store without one); a crashed merge re-runs idempotently
    * (deterministic `m<i>_` names, landed files skip). The merged store
    * is born audited — both tables are exact unions, so the derived
    * invariant set is untouched. `moveFiles = true` renames (the
    * O(files) promotion that consumes the shards). */
  def mergeStores(spark: SparkSession, sources: Seq[String], dest: String,
                  moveFiles: Boolean = false): Unit = {
    graft.operators.MergeGuards.requireMergeable(sources, dest)
    graft.FsOps.requireNotHusk(spark, dest)
    if (storedGeometry(spark, dest).nonEmpty) {
      // committed dest: either the move-mode crash window between the
      // commit and the husk stamps (complete the stamps and return —
      // FsOps.completeHuskStamps), or a genuine re-merge to refuse
      if (moveFiles && graft.FsOps.completeHuskStamps(spark, sources, dest,
          Seq("sets", "buckets"))) return
      throw new IllegalArgumentException(
        s"$dest already carries a committed signature store (geometry marker exists)")
    }
    sources.foreach(graft.FsOps.requireNotHusk(spark, _))
    val geoms = sources.map { s =>
      storedGeometry(spark, s).getOrElse(throw new IllegalArgumentException(
        s"$s has no geometry marker — not a persisted signature store"))
    }
    require(geoms.distinct.size == 1,
      s"sources disagree on (numHashes, bands) geometry: " +
        s"${sources.zip(geoms).mkString(", ")} — mismatched geometries " +
        "bucket-collide on different band hashes; rebuild the odd shard")
    val batches = sources.map { s =>
      lastBatch(spark, s).getOrElse(throw new IllegalArgumentException(
        s"$s predates batch tracking (no _lastbatch marker)"))
    }
    val shingleNs = sources.map { s =>
      readLongMarker(spark, s, ShingleMarker).getOrElse(
        throw new IllegalArgumentException(
          s"$s records no $ShingleMarker marker — shingle size is " +
            "invisible in the schema and a mixed-shingle merge silently " +
            "mis-dedups; rebuild the shard to record it"))
    }
    require(shingleNs.distinct.size == 1,
      s"sources disagree on shingleN: ${sources.zip(shingleNs).mkString(", ")}")
    // a dest already holding transferred sets is a crashed merge being
    // RESUMED: the data-reading guards passed before the first file
    // moved, and a move-drained source's tables no longer read — skip
    val destSets = new Path(s"$dest/sets")
    if (!destSets.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(destSets)) {
      for (t <- Seq("sets", "buckets"))
        graft.operators.MergeGuards.requireSchemaParity(spark, sources, t)
      graft.operators.MergeGuards.requireDisjointIds(spark,
        sources.map(s => s"$s/sets"), "doc_id")
    }
    // record the source list on the dest BEFORE any file moves — the
    // source-specific resume evidence completeHuskStamps verifies
    graft.FsOps.recordMergeSources(spark, dest, sources)
    for (t <- Seq("sets", "buckets"); (src, i) <- sources.zipWithIndex)
      graft.FsOps.transferDataFiles(spark, s"$src/$t", s"$dest/$t",
        s"m${i}_", moveFiles)
    writeLongMarker(spark, dest, ShingleMarker, shingleNs.head)
    writeLongMarker(spark, dest, LastBatchMarker, batches.max)
    markAudited(spark, dest, Some(batches.max))
    writeGeometry(spark, dest, geoms.head._1, geoms.head._2)
    // stamp drained sources only after the geometry commit above (husk
    // contract — see FsOps.MergedIntoMarker)
    if (moveFiles)
      sources.foreach(s =>
        graft.FsOps.writeMarker(spark, s, graft.FsOps.MergedIntoMarker, dest))
  }

  /** Remove documents from the signature store — the maintenance
    * counterpart of [[ingest]]'s append-only growth: a doc dropped from
    * the corpus (retention, takedown, quality purge) must stop blocking
    * future near-duplicates of itself. Both tables are REWRITTEN without
    * the ids and installed via the crash-safe rename-aside swap
    * (graft.FsOps.atomicSwap); ids absent from the store are ignored
    * (idempotent re-run).
    *
    * Scale: a compaction-class maintenance job, ∝ the signature tables
    * (~bands rows + one shingle set per doc — store-sized, never the
    * corpus text), not an ingest-path cost. The tombstone alternative
    * would charge every future ingest an extra anti-join on the stored
    * side instead; removal traffic is rare enough that the rewrite wins
    * (same trade as the index stores' expunge). */
  def removeDocs(spark: SparkSession, path: String, ids: DataFrame,
                 idCol: String = "doc_id"): Unit = {
    graft.FsOps.requireNotHusk(spark, path) // consumed shard: pointed refusal
    val rm = ids.select(col(idCol).as("doc_id")).distinct()
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (t <- Seq("sets", "buckets")) {
      spark.read.parquet(s"$path/$t")
        .join(rm, Seq("doc_id"), "left_anti")
        .write.mode("overwrite").parquet(s"$path/${t}_tmp")
      graft.FsOps.atomicSwap(fs, new Path(s"$path/$t"), new Path(s"$path/${t}_tmp"))
    }
  }

  /** Integrity check ("fsck") for a persisted signature store — the dedup
    * twin of [[graft.index.Indexer.checkStore]]: one report row per
    * invariant, `(invariant, checked, violations)`, all-zero violations
    * when healthy.
    *
    * Both [[ingest]] (two sequential appends) and [[removeDocs]] (two
    * sequential table swaps) have a crash window BETWEEN their `sets` and
    * `buckets` writes; a crash there leaves the two tables describing
    * different document populations — near-dups of the drifted docs then
    * silently pass or block. This checker is the detect step; repair is
    * [[refreshBuckets]] (re-derive `buckets` from `sets`) or re-running
    * the interrupted removeDocs.
    *
    * Invariants (report order):
    *   - `bucket_cardinality` — every doc carries exactly `bands` bucket
    *     rows over the full band range (a short set means a
    *     mixed-geometry append: those docs collide on fewer bands and
    *     quietly lose recall).
    *   - `buckets_match_signatures` — the stored buckets equal a fresh
    *     minhash+LSH recompute from the stored shingle sets with the
    *     declared geometry: the content invariant (catches a sets
    *     rewrite that never regenerated buckets, and any geometry
    *     mismatch between the two tables).
    *   - `id_surface_match` — `sets` and `buckets` hold the same doc_id
    *     population (the crash-window drift above).
    *   - `ids_unique` — one shingle-set row per doc_id.
    *
    * Scale: the recompute is one pass over `sets` (signatures ∝ docs ×
    * numHashes — store-sized, never corpus text) plus a
    * `(doc_id, band, bucket)`-keyed full-outer join against the stored
    * buckets; scheduled maintenance, not an ingest-path cost. Nothing
    * collects to the driver.
    */
  def checkStore(spark: SparkSession, path: String,
                 numHashes: Int = 128, bands: Int = 32): DataFrame = {
    graft.FsOps.requireNotHusk(spark, path) // consumed shard: pointed refusal
    requireGeometry(spark, path, numHashes, bands, "checkStore")
    import graft.operators.StoreCheck.row
    // one shared pass per audited table (sets feeds the uniqueness,
    // surface AND bucket-recompute checks; buckets feeds three) — the
    // deep audit is priced per pass over the store, so each table
    // materializes once and the eager ≤ 4-row report releases the cache
    val storage = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sets = spark.read.parquet(s"$path/sets").persist(storage)
    val buckets = spark.read.parquet(s"$path/buckets").persist(storage)

    val unique = row("ids_unique",
      sets.agg(count(lit(1)).as("checked"),
          countDistinct(col("doc_id")).as("d"))
        .select(col("checked"), (col("checked") - col("d")).as("violations")))

    val surface = {
      val a = sets.select("doc_id").distinct().withColumn("in_sets", lit(1))
      val b = buckets.select("doc_id").distinct().withColumn("in_buckets", lit(1))
      row("id_surface_match",
        a.join(b, Seq("doc_id"), "full_outer").agg(
          sum(when(col("in_sets").isNotNull, 1L).otherwise(0L)).as("checked"),
          sum(when(col("in_sets").isNull || col("in_buckets").isNull, 1L)
            .otherwise(0L)).as("violations")))
    }

    val cardinality = row("bucket_cardinality",
      buckets.groupBy("doc_id")
        .agg(count(lit(1)).as("rows"), countDistinct(col("band")).as("dbands"))
        .agg(count(lit(1)).as("checked"),
          sum(when(col("rows") =!= bands.toLong || col("dbands") =!= bands.toLong, 1L)
            .otherwise(0L)).as("violations")))

    val content = {
      val recomputed = deriveBuckets(sets, numHashes, bands)
        .select(col("doc_id"), col("band"), col("bucket"))
        .withColumn("rec", lit(1))
      val stored = buckets.select("doc_id", "band", "bucket")
        .withColumn("sto", lit(1))
      row("buckets_match_signatures",
        stored.join(recomputed, Seq("doc_id", "band", "bucket"), "full_outer").agg(
          sum(when(col("rec").isNotNull, 1L).otherwise(0L)).as("checked"),
          sum(when(col("rec").isNull || col("sto").isNull, 1L).otherwise(0L))
            .as("violations")))
    }

    try graft.operators.StoreCheck.materialize(spark,
      graft.operators.StoreCheck.report(
        Seq(cardinality, content, surface, unique)))
    finally { sets.unpersist(); buckets.unpersist() }
  }

  /** Re-derive `buckets` from the stored shingle `sets` and install it
    * via the crash-safe swap — the REPAIR step beside [[checkStore]]'s
    * detect (the `sets` table is authoritative: buckets are derived
    * state, exactly [[writeSignatures]]'s derivation). Fixes every
    * bucket-side drift the checker flags: the ingest/removeDocs crash
    * window (tables describing different populations), a mixed-geometry
    * append, a buckets table lost or clobbered outright. Cost ∝ the
    * signature store (docs × numHashes), never corpus text — a
    * scheduled maintenance job, like the index store's refreshDerived. */
  def refreshBuckets(spark: SparkSession, path: String,
                     numHashes: Int = 128, bands: Int = 32): Unit = {
    requireGeometry(spark, path, numHashes, bands, "refreshBuckets")
    val sets = spark.read.parquet(s"$path/sets")
    val derived = deriveBuckets(sets, numHashes, bands)
    // a batch-tracked store's repaired buckets re-inherit each doc's
    // ingest ordinal from its (authoritative) sets row, so incremental
    // audits keep working after a repair
    val withBatch =
      if (sets.columns.contains("batch"))
        derived.join(sets.select("doc_id", "batch"), "doc_id")
      else derived
    withBatch.write.mode("overwrite").parquet(s"$path/buckets_tmp")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.FsOps.atomicSwap(fs,
      new Path(s"$path/buckets"), new Path(s"$path/buckets_tmp"))
  }

  /** Incremental integrity check: audit ONLY the rows ingested since
    * the last vouched-for batch ([[markAudited]]) — the daily-cadence
    * audit; the full [[checkStore]] stays the scheduled deep audit
    * (its content invariant recomputes minhash over the WHOLE sets
    * table, the one ∝-store cost here). Requires a batch-tracked store
    * (writeSignatures since batch tracking).
    *
    * Delta-scoped invariants (`delta_`-prefixed twins of the full
    * checker's): per-doc band cardinality, buckets-vs-recompute content
    * equality (minhash recomputed from DELTA sets only — ∝ delta), and
    * sets⟷buckets id-surface match WITHIN the delta — which is exactly
    * where [[ingest]]'s crash window lands (sets append committed,
    * buckets append lost: the drifted docs are delta docs by
    * construction). `delta_ids_unique` checks delta ids against the
    * WHOLE id surface (one column-pruned doc_id scan — no shingle sets
    * move; a re-sent id would otherwise shadow its stored twin). */
  def checkStoreIncremental(spark: SparkSession, path: String,
                            numHashes: Int = 128, bands: Int = 32,
                            sinceBatch: Option[Long] = None): DataFrame = {
    requireGeometry(spark, path, numHashes, bands, "checkStoreIncremental")
    import graft.operators.StoreCheck.row
    val sets = spark.read.parquet(s"$path/sets")
    val buckets = spark.read.parquet(s"$path/buckets")
    require(sets.columns.contains("batch") && buckets.columns.contains("batch"),
      s"checkStoreIncremental: store at $path carries no batch ordinals " +
        "(written before batch tracking) — run the full checkStore instead")
    val since = sinceBatch.orElse(lastAudited(spark, path)).getOrElse(-1L)
    val dSets = sets.filter(col("batch") > since)
    val dBuckets = buckets.filter(col("batch") > since)

    val unique = {
      val counts = sets.select("doc_id")
        .join(dSets.select("doc_id").distinct(), Seq("doc_id"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("c"))
      row("delta_ids_unique",
        dSets.agg(count(lit(1)).as("checked")).crossJoin(
          counts.agg(coalesce(sum(when(col("c") > 1, 1L).otherwise(0L)), lit(0L))
            .as("violations"))))
    }

    val surface = {
      val a = dSets.select("doc_id").distinct().withColumn("in_sets", lit(1))
      val b = dBuckets.select("doc_id").distinct().withColumn("in_buckets", lit(1))
      row("delta_id_surface_match",
        a.join(b, Seq("doc_id"), "full_outer").agg(
          sum(when(col("in_sets").isNotNull, 1L).otherwise(0L)).as("checked"),
          sum(when(col("in_sets").isNull || col("in_buckets").isNull, 1L)
            .otherwise(0L)).as("violations")))
    }

    val cardinality = row("delta_bucket_cardinality",
      dBuckets.groupBy("doc_id")
        .agg(count(lit(1)).as("rows"), countDistinct(col("band")).as("dbands"))
        .agg(count(lit(1)).as("checked"),
          sum(when(col("rows") =!= bands.toLong || col("dbands") =!= bands.toLong, 1L)
            .otherwise(0L)).as("violations")))

    val content = {
      val recomputed = deriveBuckets(dSets, numHashes, bands)
        .select(col("doc_id"), col("band"), col("bucket"))
        .withColumn("rec", lit(1))
      val stored = dBuckets.select("doc_id", "band", "bucket")
        .withColumn("sto", lit(1))
      row("delta_buckets_match_signatures",
        stored.join(recomputed, Seq("doc_id", "band", "bucket"), "full_outer").agg(
          sum(when(col("rec").isNotNull, 1L).otherwise(0L)).as("checked"),
          sum(when(col("rec").isNull || col("sto").isNull, 1L).otherwise(0L))
            .as("violations")))
    }

    graft.operators.StoreCheck.report(
      Seq(cardinality, content, surface, unique))
  }

  /** Streaming dedup-on-ingest: every micro-batch of a document stream is
    * deduped against all documents ingested in EARLIER batches (the store
    * grows between batches, so later batches dedup against stream-arrived
    * docs); per-batch duplicate reports land under `path/reports`, one
    * subdirectory per batch id. The first batch against an empty store
    * bootstraps it. State is the persisted store itself — nothing
    * accumulates in streaming state, so a watermark-free source is fine.
    *
    * Replay-safe: Structured Streaming re-runs a micro-batch after a
    * failure with the SAME batch id — docs whose ids the store already
    * holds (appended by the failed attempt) are excluded up front, so a
    * retry neither self-flags survivors at jaccard 1.0 nor double-appends
    * them, and the per-batch report directory is overwritten, not
    * appended.
    *
    * Duplicates WITHIN one micro-batch are not detected (same contract as
    * [[ingest]] — both copies enter the store); run
    * [[Dedup.minhashLshPairs]] over a batch first if intra-batch dups
    * matter.
    */
  def writeIngesting(docs: DataFrame, path: String, minJaccard: Double,
                     checkpoint: String,
                     idCol: String = "doc_id", textCol: String = "text",
                     shingleN: Int = 3, numHashes: Int = 128, bands: Int = 32)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val spark = batch.sparkSession
        val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
        // empty report with the id column's actual type (a long-typed
        // lit(0) bootstrap would poison the reports dir for string ids)
        def emptyReport = batch
          .select(col(idCol).as("new_id"), col(idCol).as("dup_of"),
            lit(0.0).as("jaccard"))
          .limit(0)
        val report =
          if (!fs.exists(new Path(s"$path/buckets"))) {
            writeSignatures(batch, path, idCol, textCol, shingleN, numHashes, bands)
            emptyReport
          } else {
            // replay guard: drop docs already in the store BY ID (only a
            // retried attempt or an upstream id re-send produces them)
            val fresh = batch.join(
              spark.read.parquet(s"$path/sets").select(col("doc_id").as(idCol)),
              Seq(idCol), "left_anti")
            ingest(spark, path, fresh, minJaccard, idCol, textCol,
              shingleN, numHashes, bands)
          }
        report.withColumn("batch_id", lit(id))
          .write.mode("overwrite").parquet(s"$path/reports/batch=$id")
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
