// Phase breakdown of q_stream_prep_ingest (VERDICT r16 #3: 11.28 s at
// r15 -> 13.04 s at r16 on a FASTER box — the round's one era-normalized
// uptick, and now the most expensive gate entry; is it fixture build,
// the streaming micro-batches, or the decontamination tail?). Times the
// entry's four phases separately, twice, on the sf0.1 fixture, then the
// gate entry end-to-end for the headline number. Run SOLO via:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --driver-class-path target/scala-2.13/classes \
//     -I tools/profile_stream_ingest.scala <<< 'sys.exit(0)'
// NOTE multi-line statements are paren-wrapped for the -I loader (see
// gen_sf1.scala's note on leading-dot chains).
import org.apache.spark.sql.functions._
import graft.pipeline.PrepPipeline.{isBench, qualityKept}

val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
val d = spark.read.parquet(s"$sf/documents.parquet")

def t[A](tag: String)(f: => A): A = {
  val t0 = System.nanoTime(); val r = f
  println(f"PROFILE $tag%-14s ${(System.nanoTime() - t0) / 1e9}%.2f s")
  r
}

for (rep <- 1 to 2) {
  val root = s"/tmp/graft-profile-spi-$rep"
  (org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    .delete(new org.apache.hadoop.fs.Path(root), true))
  println(s"--- rep $rep")
  val bench = d.filter(isBench)
  val pool = d.filter(!isBench)
  val store = qualityKept(pool.filter(col("doc_id") % 2 === 0))
  val today = qualityKept(pool.filter(col("doc_id") % 2 === 1))
  t("sig_store")(graft.dedup.DedupStore.writeSignatures(store, s"$root/store"))
  t("drops")(graft.streaming.StreamRuntime.orderedDrops(spark, Seq(
    today.filter(col("doc_id") % 4 === 1),
    today.filter(col("doc_id") % 4 === 3)), s"$root/src"))
  val ids = t("stream")(graft.streaming.StreamRuntime.runPrepIngest(spark,
    s"$root/src", s"$root/store", 0.5, s"$root/out"))
  t("decon")(graft.pipeline.Contamination.decontaminate(
    d.join(ids, Seq("doc_id")), bench, minShared = 2L).count())
  t("total_recheck")(graft.queries.PipelineQueries
    .queries("q_stream_prep_ingest")(spark, sf).collect())
}
