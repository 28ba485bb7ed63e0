package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL (one JSON document per line) corpus source/sink — the de-facto
  * interchange format of LLM training-data pipelines (each line a doc
  * with text + metadata). Spark's json datasource IS line-delimited by
  * default, so both directions are fully distributed scans/writes; what
  * this wrapper adds is the corpus schema contract and explicit
  * malformed-line accounting.
  *
  * Scale: reading JSONL with an EXPLICIT schema avoids the
  * whole-dataset inference pass Spark otherwise runs; gzip-chunked JSONL
  * shards parallelize per file, uncompressed per split.
  */
object JsonlCorpus {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType)))

  /** Corpus → JSONL shards. `codec` e.g. Some("gzip") for the compressed
    * shards web-crawl corpora actually ship as; None = plain text.
    * Gzip shards are NOT splittable — at 100 TB keep individual shards
    * near the target partition size (one shard = one read task). */
  def write(corpus: DataFrame, path: String, codec: Option[String] = None): Unit = {
    val w = corpus.write.mode("overwrite")
    codec.fold(w)(c => w.option("compression", c)).json(path)
  }

  /** JSONL → corpus, silently dropping lines that do not parse or lack a
    * doc_id (DROPMALFORMED — the TsvCorpus guard, in json form). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)
      .filter(col("doc_id").isNotNull)

  /** JSONL → (corpus, bad-line count) for pipelines that must account for
    * every dropped input line rather than silently shedding them. */
  def readCounting(spark: SparkSession, path: String): (DataFrame, Long) = {
    val withCorrupt = spark.read
      .schema(schema.add(StructField("_corrupt_record", StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .cache() // corrupt-record accounting reads the frame twice
    val bad = withCorrupt
      .filter(col("_corrupt_record").isNotNull || col("doc_id").isNull).count()
    val good = withCorrupt
      .filter(col("_corrupt_record").isNull && col("doc_id").isNotNull)
      .drop("_corrupt_record")
    (good, bad)
  }
}
