package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-shaped text sources/sinks.
  *
  * The reference round-trips its corpus through `id\ttitle\ttext` lines in
  * HDFS (`prepare_data.py:53-55` writes via collect+parallelize;
  * `mapreduce/mapper1.py:5-9` re-parses on stdin). We keep parquet on the
  * hot path, but provide the same file shapes as distributed read/write —
  * no driver round-trip, no per-row shell-outs.
  */
object TsvCorpus {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("title", StringType),
    StructField("text", StringType)))

  /** S3 (reference): corpus → `id\ttitle\ttext` lines. Tabs/newlines in
    * fields are squashed first (`prepare_data.py:33` does the same for
    * titles) so the line format stays parseable.
    */
  def write(corpus: DataFrame, path: String,
            idCol: String = "doc_id", titleCol: String = "title",
            textCol: String = "text"): Unit =
    corpus.select(concat_ws("\t",
        col(idCol),
        regexp_replace(col(titleCol), "[\\t\\n]", " "),
        regexp_replace(col(textCol), "[\\t\\n]", " ")).as("value"))
      .write.mode("overwrite").text(path)

  /** S5 (reference): parse `id\ttitle\ttext` lines, dropping blank and
    * malformed rows (the mapper's guard, `mapper1.py:6-11`). `try_cast`
    * (not `cast`) so a non-numeric id yields NULL and is filtered — under
    * Spark 4's default `spark.sql.ansi.enabled=true` a plain cast would
    * throw and fail the whole job on one malformed line. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val parts = split(col("value"), "\t")
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0 && size(parts) === 3)
      .select(
        element_at(parts, 1).try_cast("long").as("doc_id"),
        element_at(parts, 2).as("title"),
        element_at(parts, 3).as("text"))
      .filter(col("doc_id").isNotNull)
  }
}
