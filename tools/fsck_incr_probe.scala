// Incremental-audit scaling probe (run via spark-shell with
// --driver-class-path target/scala-2.13/classes — see tools/bench_sf1.sh):
// appends the SAME fixed-size delta batch to a 1x store (sf0.1 docs) and
// a 10x store (/tmp/sf1 docs), then times Indexer.checkStoreIncremental
// vs the full Indexer.checkStore on each, DISPATCHED THROUGH graft.Maintain
// (the ops CLI path is what gets measured). The claim under test
// (SCALE.md): the incremental audit's cost tracks the DELTA (flat across
// store sizes — pre-audit files are skipped via parquet min/max
// statistics on the per-file-constant batch ordinal), while the full
// deep audit's cost tracks the STORE (~10x).
import org.apache.spark.sql.functions._
def time[T](f: => T): Double = {
  val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
}
def probe(src: String, tag: String): Unit = {
  val d = spark.read.parquet(src)
  val maxId = d.agg(max("doc_id")).head.getLong(0)
  val delta = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    .orderBy("doc_id").limit(2000)
    .withColumn("doc_id", col("doc_id") + lit(maxId + 1L))
  val path = s"/tmp/fsckprobe_$tag"
  new org.apache.hadoop.fs.Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
    .delete(new org.apache.hadoop.fs.Path(path), true)
  graft.index.Indexer.writeIndex(graft.index.Indexer.buildIndex(d), path)
  graft.index.Indexer.markAudited(spark, path)
  graft.index.Indexer.appendIndex(spark, path, delta)
  // min-of-2 for both, same discipline as the bench
  // timed through the Maintain CLI dispatch - the probe measures the
  // same entry point an operator's cron job runs
  val tIncr = Seq.fill(2)(time(
    graft.Maintain.run(spark, "index", "fsck-incr", path).get.collect())).min
  val tFull = Seq.fill(2)(time(
    graft.Maintain.run(spark, "index", "fsck", path).get.collect())).min
  // compact the batch-tracked tables range-partitioned by batch (1 MiB
  // target so multiple files survive at probe scale, mirroring the
  // many-files-per-leaf state a 128 MiB target leaves at 100 TB) and
  // re-time: the incremental audit's file skipping must survive
  // compaction (post_incr ~ incr, not ~ full)
  graft.operators.Compaction.compactPartitionsRecursive(
    spark, s"$path/postings", targetBytes = 1L * 1024 * 1024,
    rangeBy = Seq("batch"))
  graft.operators.Compaction.compact(spark, s"$path/doc_stats",
    targetBytes = 1L * 1024 * 1024, rangeBy = Seq("batch"))
  val tIncrC = Seq.fill(2)(time(
    graft.Maintain.run(spark, "index", "fsck-incr", path).get.collect())).min
  println(f"PROBE tag=$tag%s store_docs=${d.count()}%d delta_docs=2000 " +
    f"incr=$tIncr%.2fs full=$tFull%.2fs post_compact_incr=$tIncrC%.2fs")
}
probe("/root/testdata/sf0.1/documents.parquet", "sf01")
probe("/tmp/sf1/documents.parquet", "sf1")

// Versioned-store twin of the same claim: a fixed one-commit delta after
// the vouched watermark — the incremental audit reads log v5 alone (no
// checkpoint written since the audit, so nothing derived to re-derive),
// while the full audit replays the newest checkpoint and scans the whole
// log. incr must stay flat across store sizes; full tracks the store.
def vprobe(src: String, tag: String): Unit = {
  import graft.streaming.VersionedStore
  val d = spark.read.parquet(src)
    .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
  val maxId = d.agg(max("doc_id")).head.getLong(0)
  val path = s"/tmp/vfsckprobe_$tag"
  new org.apache.hadoop.fs.Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
    .delete(new org.apache.hadoop.fs.Path(path), true)
  for (i <- 0 until 4)
    VersionedStore.commit(spark, path,
      d.filter(col("doc_id") % 4 === i).withColumn("_op", lit("u")))
  VersionedStore.checkpoint(spark, path, 4L, Seq("doc_id"))
  VersionedStore.markAudited(spark, path)
  val delta = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    .orderBy("doc_id").limit(2000)
    .withColumn("doc_id", col("doc_id") + lit(maxId + 1L))
    .withColumn("_op", lit("u"))
  VersionedStore.commit(spark, path, delta)
  val tIncr = Seq.fill(2)(time(
    graft.Maintain.run(spark, "vstore", "fsck-incr", path, Seq("doc_id")).get.collect())).min
  val tFull = Seq.fill(2)(time(
    graft.Maintain.run(spark, "vstore", "fsck", path, Seq("doc_id")).get.collect())).min
  println(f"PROBE tag=$tag%s store_docs=${d.count()}%d delta_docs=2000 " +
    f"incr=$tIncr%.2fs full=$tFull%.2fs")
}
vprobe("/root/testdata/sf0.1/documents.parquet", "vs_sf01")
vprobe("/tmp/sf1/documents.parquet", "vs_sf1")

// Dedup signature store: same fixed delta discipline. The delta's
// tokens get a "zz" prefix so its content is NOVEL against both store
// sizes (otherwise the store-side dedup withholds it and there is no
// delta to audit). incr recomputes minhash over delta sets only; full
// recomputes over the whole store.
def dprobe(src: String, tag: String): Unit = {
  import graft.dedup.DedupStore
  val d = spark.read.parquet(src).select("doc_id", "text")
  val maxId = d.agg(max("doc_id")).head.getLong(0)
  val path = s"/tmp/dfsckprobe_$tag"
  new org.apache.hadoop.fs.Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
    .delete(new org.apache.hadoop.fs.Path(path), true)
  DedupStore.writeSignatures(d, path)
  DedupStore.markAudited(spark, path)
  val delta = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    .select("doc_id", "text").orderBy("doc_id").limit(2000)
    .withColumn("doc_id", col("doc_id") + lit(maxId + 1L))
    .withColumn("text", array_join(
      transform(split(col("text"), " "), t => concat(lit("zz"), t)), " "))
  DedupStore.ingest(spark, path, delta, 0.5)
  val tIncr = Seq.fill(2)(time(
    graft.Maintain.run(spark, "dedup", "fsck-incr", path).get.collect())).min
  val tFull = Seq.fill(2)(time(
    graft.Maintain.run(spark, "dedup", "fsck", path).get.collect())).min
  println(f"PROBE tag=$tag%s store_docs=${d.count()}%d delta_docs=2000 " +
    f"incr=$tIncr%.2fs full=$tFull%.2fs")
}
dprobe("/root/testdata/sf0.1/documents.parquet", "dd_sf01")
dprobe("/tmp/sf1/documents.parquet", "dd_sf1")

// IVF store: centroid bootstrap + batch-0 append from the source vecs
// (vouched), then a fixed 500-vector delta as batch 1. incr prunes
// pre-audit batch= directories before touching a data file; full
// re-derives assignment over every list row.
def iprobe(src: String, tag: String): Unit = {
  import graft.similarity.IvfStore
  val e = spark.read.parquet(src)
  val maxVid = e.agg(max("vec_id")).head.getLong(0)
  val path = s"/tmp/ifsckprobe_$tag"
  new org.apache.hadoop.fs.Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
    .delete(new org.apache.hadoop.fs.Path(path), true)
  IvfStore.writeCentroids(e, path, kmeansIters = 0)
  IvfStore.appendBatch(spark, path, e, 0L)
  IvfStore.markAudited(spark, path)
  val delta = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    .orderBy("vec_id").limit(500)
    .withColumn("vec_id", col("vec_id") + lit(maxVid + 1L))
  IvfStore.appendBatch(spark, path, delta, 1L)
  val tIncr = Seq.fill(2)(time(
    graft.Maintain.run(spark, "ivf", "fsck-incr", path).get.collect())).min
  val tFull = Seq.fill(2)(time(
    graft.Maintain.run(spark, "ivf", "fsck", path).get.collect())).min
  println(f"PROBE tag=$tag%s store_docs=${e.count()}%d delta_docs=500 " +
    f"incr=$tIncr%.2fs full=$tFull%.2fs")
}
iprobe("/root/testdata/sf0.1/embeddings.parquet", "iv_sf01")
iprobe("/tmp/sf1/embeddings.parquet", "iv_sf1")
