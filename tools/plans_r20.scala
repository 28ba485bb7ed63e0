// Dump explain("formatted") for the round-20-touched queries into
// plans/r20/<name>_<suffix>.txt. Run via spark-shell -I (see
// tools/gen_plans.sh for the invocation shape):
//   PLANS_SUFFIX=after /opt/spark/bin/spark-shell ... -I tools/plans_r20.scala
// The suffix comes from env PLANS_SUFFIX (before|after); the output dir
// from PLANS_DIR (default plans/r20 under the cwd).
import org.apache.spark.sql.execution.ExplainMode

val suffix = sys.env.getOrElse("PLANS_SUFFIX", "after")
val outDir = java.nio.file.Paths.get(sys.env.getOrElse("PLANS_DIR", "plans/r20"))
java.nio.file.Files.createDirectories(outDir)
val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

val names = Seq(
  // cross-store governance + promote
  "q_pipeline_merge", "q_pipeline_forget", "q_stream_forget",
  "q_retention_sweep", "q_vstore_purge",
  // index store lifecycle
  "q_store_compact", "q_store_fsck", "q_store_fsck_incr",
  "q_store_merge_append", "q_bm25_expunge",
  // dedup store
  "q_dedup_ingest_remove", "q_prep_ingest",
  // IVF
  "q_ann_ivf_quant_flatten", "q_ann_ivf_quant_merge",
  // streaming runtimes (volume-derived state width)
  "q_stream_tumbling_runtime", "q_stream_dedup_runtime")

spark.sparkContext.setLogLevel("ERROR")
for (n <- names) {
  try {
    val df = graft.SparkEntry.queries(n)(spark, sfDir)
    val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    java.nio.file.Files.writeString(outDir.resolve(s"${n}_$suffix.txt"), txt)
    println(s"[plans] wrote $n ($suffix)")
  } catch { case e: Throwable =>
    println(s"[plans] FAILED $n: ${e.getClass.getSimpleName}: ${e.getMessage}")
  }
}
