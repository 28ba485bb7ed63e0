package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Promote N shard-built PIPELINE ROOTS into one serving root — the
  * composition of the per-family shard merges over the same layout
  * convention [[Forget]] governs (`<root>/index`, `<root>/dedup`,
  * `<root>/ivf`): each ingest partition materializes its own complete
  * root in parallel (index + signature store + ANN store over its
  * corpus slice), and promotion merges family-by-family —
  * [[graft.index.StoreMerge.mergeStores]] (aligned term buckets, file
  * transfer + vocab/meta partial merge),
  * [[graft.dedup.DedupStore.mergeStores]] (deterministic signatures,
  * pure file transfer), [[graft.similarity.IvfStore.mergeStores]]
  * (centroid union, cid-remapped directory transfer). No corpus text,
  * posting, signature or vector is read or shuffled anywhere in the
  * promotion. [[Forget.checkPipeline]] is the post-promotion audit: all
  * live id surfaces must be identical (every shard root was internally
  * consistent and the id spaces are disjoint, so the union is too).
  *
  * Contracts: every root must hold the SAME families (a root that
  * indexed but never embedded merged into one that did would serve a
  * drifted surface — exactly what checkPipeline flags); `vstore`
  * refuses (versioned histories have per-root commit sequences that do
  * not union — promote the metadata by committing the union into a
  * fresh store); roots with `_forget` manifests refuse (manifest
  * ordinals are per-root; run takedowns at the merged root instead).
  * Crash model: each family merge has its own commit marker and
  * idempotent resume, and [[mergeRoots]] SKIPS families whose dest
  * store is already committed — so a promotion that died anywhere
  * (mid-transfer or between families) re-runs to completion.
  */
object Promote {

  /** Merge every family store of `roots` into `dest`; returns the
    * families promoted (sorted). `moveFiles = true` renames data files
    * (the O(files) path that consumes the shard roots). */
  def mergeRoots(spark: SparkSession, roots: Seq[String], dest: String,
                 moveFiles: Boolean = false): Seq[String] = {
    require(roots.size >= 2, "mergeRoots needs at least two shard roots")
    val famSets = roots.map(r => Forget.familiesAt(spark, r).toSet)
    require(famSets.distinct.size == 1,
      s"shard roots must hold the SAME store families; got " +
        s"${roots.zip(famSets.map(_.mkString("{", ",", "}"))).mkString(", ")}")
    val fams = famSets.head
    require(fams.nonEmpty, s"no store families found under ${roots.head}")
    require(!fams.contains("vstore"),
      "vstore histories have per-root commit sequences that do not " +
        "union — commit the merged metadata into a fresh store instead")
    roots.foreach { r =>
      val p = new Path(s"$r/_forget")
      require(!p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p),
        s"$r carries _forget manifests (per-root ordinals do not merge) — " +
          "promote fresh shards; run takedowns at the merged root")
    }
    // a family whose dest store already carries its commit marker was
    // completed by a PREVIOUS run of this same promotion — skip it, so a
    // crash between families resumes instead of dying on the committed
    // store's own already-merged guard (dest must be a fresh root at the
    // first call, like every family merge's dest)
    if (fams.contains("index") &&
        graft.index.Indexer.storedBuckets(spark, s"$dest/index").isEmpty)
      graft.index.StoreMerge.mergeStores(spark,
        roots.map(r => s"$r/index"), s"$dest/index", moveFiles)
    if (fams.contains("dedup") &&
        graft.dedup.DedupStore.storedGeometry(spark, s"$dest/dedup").isEmpty)
      graft.dedup.DedupStore.mergeStores(spark,
        roots.map(r => s"$r/dedup"), s"$dest/dedup", moveFiles)
    if (fams.contains("ivf")) {
      val cents = new Path(s"$dest/ivf/centroids")
      if (!cents.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(cents))
        graft.similarity.IvfStore.mergeStores(spark,
          roots.map(r => s"$r/ivf"), s"$dest/ivf", moveFiles)
    }
    fams.toSeq.sorted
  }
}
