// Phase breakdown of q_bm25_store_bucketed (VERDICT r15 #4: 11.5 s at
// r15 vs 8.2 s at r13 — is the drift a real write-path regression or
// min-of-2 sampling?). Times the entry's four phases separately, twice,
// on the sf0.1 fixture. Run via:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --driver-class-path target/scala-2.13/classes \
//     -I tools/profile_bucketed.scala <<< 'sys.exit(0)'
import org.apache.spark.sql.functions._

val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
val d = (spark.read.parquet(s"$sf/documents.parquet")
  .select(col("doc_id"), col("text"), col("source")))

def t[A](tag: String)(f: => A): A = {
  val t0 = System.nanoTime(); val r = f
  println(f"PROFILE $tag%-14s ${(System.nanoTime() - t0) / 1e9}%.2f s")
  r
}

for (rep <- 1 to 2) {
  val path = s"/tmp/graft-profile-bkt-$rep"
  org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    .delete(new org.apache.hadoop.fs.Path(path), true)
  println(s"--- rep $rep")
  val ix = t("buildIndex")(graft.index.Indexer.buildIndex(
    d.filter(col("doc_id") % 2 === 0), titleCol = Some("source")))
  t("writeIndex")(graft.index.Indexer.writeIndex(ix, path, docBuckets = Some(8)))
  t("appendIndex")(graft.index.Indexer.appendIndex(spark, path,
    d.filter(col("doc_id") % 2 === 1), titleCol = Some("source")))
  t("searchStore")(graft.search.BM25.searchStore(spark, path,
    "fast hash join scan").count())
  t("total_recheck") {
    // the gate entry end-to-end, fresh path, for the headline number
    val p2 = s"$path-full"
    graft.index.Indexer.writeIndex(graft.index.Indexer.buildIndex(
      d.filter(col("doc_id") % 2 === 0), titleCol = Some("source")),
      p2, docBuckets = Some(8))
    graft.index.Indexer.appendIndex(spark, p2,
      d.filter(col("doc_id") % 2 === 1), titleCol = Some("source"))
    graft.search.BM25.searchStore(spark, p2, "fast hash join scan").count()
  }
}
