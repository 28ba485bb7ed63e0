// Serving-latency micro-bench (VERDICT r12 #4): the gate times
// build+query lifecycles; this probe isolates the WARM per-query cost a
// serving deployment actually pays — build each store once, then time k
// repeated query jobs against it, reporting p50/p95 per face, plain vs
// doc-bucketed. Run via tools/serve_latency.sh (spark-shell, compiled
// classes on the driver classpath), SOLO on an idle box.
//
// Output lines (one per face × layout):
//   SERVE face=<name> layout=<plain|docbkt> reps=N p50=S p95=S
import org.apache.spark.sql.functions._

val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
val reps = sys.env.getOrElse("SPARK_GRAFT_SERVE_REPS", "15").toInt
val root = "/tmp/serve_stores"

// paren-wrapped: the -I loader would otherwise bind fs to the PATH and
// evaluate the leading-dot line against the discarded result (the r16
// SERVEBYTES probe caught this — fs.delete below had silently never run)
val fs = (new org.apache.hadoop.fs.Path(root)
  .getFileSystem(spark.sparkContext.hadoopConfiguration))
fs.delete(new org.apache.hadoop.fs.Path(root), true)

spark.sparkContext.setLogLevel("WARN")
val docs = spark.read.parquet(s"$sfDir/documents.parquet")

// ---- build each store ONCE (build cost reported separately) ----
def timed[T](body: => T): (T, Double) = {
  val t0 = System.nanoTime(); val r = body
  (r, (System.nanoTime() - t0) / 1e9)
}
def build(tag: String)(body: => Unit): Unit = {
  val (_, s) = timed(body)
  println(f"SERVEBUILD store=$tag%s secs=$s%.3f")
}
val ix = graft.index.Indexer.buildIndex(docs, titleCol = Some("source"))
build("index_plain")  { graft.index.Indexer.writeIndex(ix, s"$root/ix_plain") }
build("index_docbkt") { graft.index.Indexer.writeIndex(ix, s"$root/ix_docbkt",
  docBuckets = Some(16)) }
build("pos_plain")  { graft.index.Indexer.writePositional(docs, s"$root/pos_plain") }
build("pos_docbkt") { graft.index.Indexer.writePositional(docs, s"$root/pos_docbkt",
  docBuckets = Some(16)) }
val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
build("ivf") { graft.similarity.IvfStore.writeIndex(emb, s"$root/ivf",
  kmeansIters = 0) }
// the int8-quantized configuration (r16): same centroids/assignment
// geometry, (scale, qvec) codes instead of floats — prices the
// "4x less probe bytes" claim with a direct warm-latency measurement
// and the stores' actual list bytes (SERVEBYTES lines below)
build("ivf_quant") { graft.similarity.IvfStore.writeIndexQuantized(emb,
  s"$root/ivf_quant", kmeansIters = 0) }
def bytesOf(p: String): Long = {
  fs.getContentSummary(new org.apache.hadoop.fs.Path(p)).getLength
}
println("SERVEBYTES store=ivf_lists bytes=" + bytesOf(s"$root/ivf/lists"))
println("SERVEBYTES store=ivf_quant_lists bytes=" + bytesOf(s"$root/ivf_quant/lists"))

// ---- merged-store serving parity (VERDICT r13 #8): the promotion's
// output must serve at plain-store latency. Index: two parity shards
// merged metadata-level. IVF: centroid-union merge doubles the centroid
// set at the same nProbe; `reclustered` shows recluster returning the
// probe cost to the pre-merge baseline.
build("index_merged") {
  graft.index.Indexer.writeIndex(
    graft.index.Indexer.buildIndex(docs.filter(col("doc_id") % 2 === 0),
      titleCol = Some("source")), s"$root/ix_shA")
  graft.index.Indexer.writeIndex(
    graft.index.Indexer.buildIndex(docs.filter(col("doc_id") % 2 === 1),
      titleCol = Some("source")), s"$root/ix_shB")
  graft.index.StoreMerge.mergeStores(spark,
    Seq(s"$root/ix_shA", s"$root/ix_shB"), s"$root/ix_merged",
    moveFiles = true)
}
// positional merged store (VERDICT r15 #5): two combined shards
// (frequency store + co-located positional table — the layout
// StoreMerge's positional transfer expects), promoted metadata-level;
// the phrase/prox batch faces then serve from the merged store
build("pos_merged") {
  val halfA = docs.filter(col("doc_id") % 2 === 0)
  val halfB = docs.filter(col("doc_id") % 2 === 1)
  graft.index.Indexer.writeIndex(
    graft.index.Indexer.buildIndex(halfA, titleCol = Some("source")),
    s"$root/pos_shA")
  graft.index.Indexer.writePositional(halfA, s"$root/pos_shA")
  graft.index.Indexer.writeIndex(
    graft.index.Indexer.buildIndex(halfB, titleCol = Some("source")),
    s"$root/pos_shB")
  graft.index.Indexer.writePositional(halfB, s"$root/pos_shB")
  graft.index.StoreMerge.mergeStores(spark,
    Seq(s"$root/pos_shA", s"$root/pos_shB"), s"$root/pos_merged",
    moveFiles = true)
}
build("ivf_merged") {
  graft.similarity.IvfStore.writeIndex(emb.filter(col("vec_id") % 2 === 0),
    s"$root/ivf_shA", kmeansIters = 0)
  graft.similarity.IvfStore.writeIndex(emb.filter(col("vec_id") % 2 === 1),
    s"$root/ivf_shB", kmeansIters = 0)
  graft.similarity.IvfStore.mergeStores(spark,
    Seq(s"$root/ivf_shA", s"$root/ivf_shB"), s"$root/ivf_merged",
    moveFiles = true)
}

// ---- query frames (deterministic, derived from the corpus) ----
// a 200-entry log: each query is the first 4 tokens of a document.
// NOTE: pipelines paren-wrapped — spark-shell -I treats a chained
// `.method` on a fresh line as a NEW expression otherwise
val log = (docs.orderBy("doc_id").limit(200)
  .select(col("doc_id").as("query_id"),
    concat_ws(" ", slice(split(col("text"), "\\s+"), 1, 4)).as("query_text"))
  .localCheckpoint(true))
val phraseLog = (log.select(col("query_id"),
    concat_ws(" ", slice(split(col("query_text"), " "), 1, 2)).as("phrase"))
  .localCheckpoint(true))
val singleQ = (log.orderBy("query_id").limit(1)
  .select("query_text").collect()(0).getString(0))
val probes = emb.orderBy("vec_id").limit(20).localCheckpoint(true)

// ---- the probe: k warm jobs per face, p50/p95 over wall seconds ----
def pct(xs: Seq[Double], p: Double): Double = {
  val s = xs.sorted
  s(math.min(s.length - 1, math.ceil(p * s.length).toInt - 1).max(0))
}
def face(name: String, layout: String)(job: => Long): Unit = {
  job // warm-up: page cache, catalog registration, codegen
  val times = (1 to reps).map { _ => val (_, s) = timed(job); s }
  println(f"SERVE face=$name%s layout=$layout%s reps=$reps%d " +
    f"p50=${pct(times, 0.50)}%.3f p95=${pct(times, 0.95)}%.3f")
}

face("bm25_single", "plain")  { graft.search.BM25.searchStore(spark, s"$root/ix_plain", singleQ).count() }
face("bm25_single", "docbkt") { graft.search.BM25.searchStore(spark, s"$root/ix_docbkt", singleQ).count() }
face("bm25_batch200", "plain")  { graft.search.BM25.searchManyStore(spark, s"$root/ix_plain", log).count() }
face("bm25_batch200", "docbkt") { graft.search.BM25.searchManyStore(spark, s"$root/ix_docbkt", log).count() }
face("phrase_batch200", "plain")  { graft.search.PhraseSearch.searchStoreMany(spark, s"$root/pos_plain", phraseLog).count() }
face("phrase_batch200", "docbkt") { graft.search.PhraseSearch.searchStoreMany(spark, s"$root/pos_docbkt", phraseLog).count() }
face("prox_batch200", "plain")  { graft.search.PhraseSearch.proximityStoreMany(spark, s"$root/pos_plain", phraseLog, 3).count() }
face("prox_batch200", "docbkt") { graft.search.PhraseSearch.proximityStoreMany(spark, s"$root/pos_docbkt", phraseLog, 3).count() }
face("ivf_probe20", "plain") { graft.similarity.IvfStore.searchStore(spark, s"$root/ivf", probes, 10).count() }
face("ivf_probe20", "quantized") { graft.similarity.IvfStore.searchStoreQuantized(spark, s"$root/ivf_quant", probes, 10).count() }

// merged faces: same query jobs against the promotion's output
face("bm25_single", "merged")   { graft.search.BM25.searchStore(spark, s"$root/ix_merged", singleQ).count() }
face("bm25_batch200", "merged") { graft.search.BM25.searchManyStore(spark, s"$root/ix_merged", log).count() }
face("phrase_batch200", "merged") { graft.search.PhraseSearch.searchStoreMany(spark, s"$root/pos_merged", phraseLog).count() }
face("prox_batch200", "merged")   { graft.search.PhraseSearch.proximityStoreMany(spark, s"$root/pos_merged", phraseLog, 3).count() }
face("ivf_probe20", "merged")   { graft.similarity.IvfStore.searchStore(spark, s"$root/ivf_merged", probes, 10).count() }

// ...and after the recluster maintenance verb (one retrain+rewrite pass,
// priced under SERVEBUILD): probe cost returns to the pre-merge baseline
build("ivf_recluster") { graft.similarity.IvfStore.reclusterStore(spark,
  s"$root/ivf_merged", nCentroids = 16, kmeansIters = 0) }
face("ivf_probe20", "reclustered") { graft.similarity.IvfStore.searchStore(spark, s"$root/ivf_merged", probes, 10).count() }

println("SERVEDONE")
