// Generate the /tmp/sf3 30x (vs sf0.1) fixture — DOCUMENTS + EMBEDDINGS
// ONLY — for the three-point (sf0.1 / sf1 / sf3) scaling check on the
// linear-tail families (VERDICT r16 #6: q_dedup_embed 10.9x and
// q_lm_score 8.7x at 10x are claimed linear scan-bound; a second decade
// point shows the exponent holds). Same replication recipe as
// tools/gen_sf1.scala (token-disjoint documents, id-shifted embeddings),
// 30 replicas; the relational/event tables are not needed by the
// dedup/text/ann families this fixture serves (run Bench with
// SPARK_GRAFT_BENCH_ONLY restricted to those queries).
// NOTE multi-line statements are paren/brace-wrapped for the -I loader
// (see gen_sf1.scala's note on leading-dot chains).
import org.apache.spark.sql.functions._
val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
val maxId = d.agg(max("doc_id")).head.getLong(0)
val parts = (0 until 30).map { i =>
  if (i == 0) d
  else d.withColumn("doc_id", col("doc_id") + lit((maxId + 1L) * i))
    .withColumn("text", array_join(
      transform(split(col("text"), " "), t => concat(lit("r" + i), t)), " "))
    .withColumn("n_chars", length(col("text")).cast(d.schema("n_chars").dataType))
}
(parts.reduce(_ unionByName _).repartition(32)
  .write.mode("overwrite").parquet("/tmp/sf3/documents.parquet"))
val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
val maxVid = e.agg(max("vec_id")).head.getLong(0)
val eParts = (0 until 30).map { i =>
  if (i == 0) e else e.withColumn("vec_id", col("vec_id") + lit((maxVid + 1L) * i))
}
(eParts.reduce(_ unionByName _).repartition(32)
  .write.mode("overwrite").parquet("/tmp/sf3/embeddings.parquet"))
println("SF3ROWS=" + spark.read.parquet("/tmp/sf3/documents.parquet").count()
  + "," + spark.read.parquet("/tmp/sf3/embeddings.parquet").count())
