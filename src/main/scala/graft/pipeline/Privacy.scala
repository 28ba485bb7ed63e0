package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy-aware data prep beyond scrubbing
  * ([[graft.text.TextAnalysis]] redacts PII *inside* text): k-anonymity
  * over quasi-identifier COLUMNS — a row is re-identifiable when its
  * quasi-identifier combination is shared by fewer than k rows, so those
  * combinations are suppressed (nulled) while large groups pass through
  * untouched. The standard release gate for metadata columns (language,
  * source/domain, region …) on a published corpus.
  *
  * Scale: group sizes are one partial-agg shuffle over the quasi
  * combination (output rows = |combinations|, bounded in practice by
  * the columns' joint cardinality, NOT the corpus); the counts
  * broadcast back in a null-safe equi-join — the corpus never shuffles
  * and never funnels through a low-cardinality window partition.
  */
object Privacy {

  /** Suppress quasi-identifier columns in groups smaller than `k`;
    * adds `anon_ok` (1 = group was large enough, columns kept). */
  def kAnonymize(df: DataFrame, quasi: Seq[String], k: Long): DataFrame = {
    require(quasi.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = quasi.foldLeft(
      df.groupBy(quasi.map(col): _*).agg(count(lit(1)).as("__n"))
    )((d, c) => d.withColumnRenamed(c, s"__q_$c"))
    // null-safe equality: a null quasi value is still a group
    val cond = quasi.map(c => col(c) <=> col(s"__q_$c")).reduce(_ && _)
    val ok = col("__n") >= k
    val joined = df.join(broadcast(counts), cond, "left")
    quasi.foldLeft(joined)((d, c) => d.withColumn(c, when(ok, col(c))))
      .withColumn("anon_ok", ok.cast("long"))
      .drop("__n" +: quasi.map(c => s"__q_$c"): _*)
  }
}
