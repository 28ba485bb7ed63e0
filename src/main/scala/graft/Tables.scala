package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Uniform access to the driver-generated fixture tables (TESTDATA.md). */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    * read as a timestamp. Read nanos as long and truncate to microseconds
    * with exact integer division (same truncation DuckDB applies when it
    * reads ns into its µs TIMESTAMP — keeps both engines aligned).
    */
  def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, sfDir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(CAST(ts DIV 1000 AS LONG))"))
  }
}
