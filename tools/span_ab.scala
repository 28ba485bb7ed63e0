// A/B/C shapes for the dupSpanStarts span-hash stream (VERDICT r11 #5):
//   A — current: evaluate the explode+hash stream twice (agg subtree +
//       semi-join probe); ONE exchange of map-side-deduped (h, doc_id)
//       partials, probe side never shuffles (broadcast semi).
//   B — shared exchange: repartition(h) before both consumers so the
//       plan reuses one exchange (ReusedExchange); the stream is
//       computed once but the exchange carries RAW span rows (no
//       map-side partial dedup) and the semi join sorts both sides.
//   C — localCheckpoint: materialize the slim stream once to block
//       storage; both consumers read it back.
// Usage:
//   SF_DIR=/root/testdata/sf0.1 /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --driver-class-path target/scala-2.13/classes -I tools/span_ab.scala <<< 'sys.exit(0)'
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.analyzer.Analyzer
import graft.pipeline.Sampling

spark.sparkContext.setLogLevel("ERROR")
val dir = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.1")
val docs = spark.read.parquet(s"$dir/documents.parquet")
val N = 8; val MinDocs = 2

def spanHashes(): DataFrame = {
  docs
    .select(col("doc_id"), Analyzer.tokens(col("text")).as("toks"))
    .filter(size(col("toks")) >= N)
    .withColumn("pos", explode(sequence(lit(1), size(col("toks")) - lit(N - 1))))
    .select(col("doc_id"), col("pos"), Sampling.saltedHash("span",
      array_join(slice(col("toks"), col("pos"), lit(N)), " ")).as("h"))
}

def finish(spans: DataFrame): DataFrame = {
  val dup = spans.groupBy("h").agg(countDistinct(col("doc_id")).as("nd"))
    .filter(col("nd") >= MinDocs).select("h")
  spans.join(dup, Seq("h"), "left_semi").select("doc_id", "pos")
    .groupBy("doc_id").agg(count(lit(1)).as("dup_spans"))
}
def shapeA(): DataFrame = finish(spanHashes())
def shapeB(): DataFrame = finish(spanHashes().repartition(col("h")))
def shapeC(): DataFrame = finish(spanHashes().localCheckpoint(true))

def consume(df: DataFrame): Unit =
  { df.selectExpr("count(*) c", "sum(dup_spans) s").collect() }

def planCounts(df: DataFrame): String = {
  consume(df)
  val p = df.queryExecution.executedPlan.toString
  def c(pat: String) = pat.r.findAllIn(p).length
  s"Generate=${c("Generate explode")} Exchange=${c("Exchange hashpartitioning")} Reused=${c("ReusedExchange")}"
}
println("AB_PLAN A: " + planCounts(shapeA()))
println("AB_PLAN B: " + planCounts(shapeB()))
println("AB_PLAN C: " + planCounts(shapeC()))

def time(label: String)(mk: () => DataFrame): Unit = {
  val secs = (1 to 2).map { _ =>
    val t0 = System.nanoTime(); consume(mk()); (System.nanoTime() - t0) / 1e9
  }
  println(f"AB_TIME $label min=${secs.min}%.2f runs=${secs.map(s => f"$s%.2f").mkString(",")}")
}
consume(shapeA()) // warmup
time("A_current")(shapeA _)
time("B_reused_exchange")(shapeB _)
time("C_localCheckpoint")(shapeC _)
