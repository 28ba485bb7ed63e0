// Generate the /tmp/sf1 10x scale fixture from the sf0.1 documents table
// (run via: /opt/spark/bin/spark-shell -I tools/gen_sf1.scala — see
// tools/bench_sf1.sh). Replication recipe (SCALE.md "sf1 spot-run"):
// replica i gets doc_ids offset by (maxId+1)*i and every token prefixed
// "r{i}", n_chars recomputed — DISJOINT vocabulary per replica, so
// dedup/LSH/prep queries scale as 10 independent corpora (clean 10x
// work, no artificial exact-duplicate explosion) while BM25 query-side
// scoring still hits only replica 0 (store build/audit/append stay 10x).
import org.apache.spark.sql.functions._
val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
val maxId = d.agg(max("doc_id")).head.getLong(0)
val parts = (0 until 10).map { i =>
  if (i == 0) d
  else d.withColumn("doc_id", col("doc_id") + lit((maxId + 1L) * i))
    .withColumn("text", array_join(
      transform(split(col("text"), " "), t => concat(lit("r" + i), t)), " "))
    .withColumn("n_chars", length(col("text")).cast(d.schema("n_chars").dataType))
}
parts.reduce(_ unionByName _).repartition(32)
  .write.mode("overwrite").parquet("/tmp/sf1/documents.parquet")
// embeddings scale the same way: replica i offsets vec_id by
// (maxVid+1)*i with the vector payload unchanged — IVF/ANN cost is a
// function of row count and list sizes, not vector values, and
// identical replicas keep the probe's answers deterministic (rank
// ties break by vec_id). Gives the ANN store family a measured 10×
// column alongside the documents families.
val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
val maxVid = e.agg(max("vec_id")).head.getLong(0)
val eParts = (0 until 10).map { i =>
  if (i == 0) e else e.withColumn("vec_id", col("vec_id") + lit((maxVid + 1L) * i))
}
eParts.reduce(_ unionByName _).repartition(32)
  .write.mode("overwrite").parquet("/tmp/sf1/embeddings.parquet")
println("SF1ROWS=" + spark.read.parquet("/tmp/sf1/documents.parquet").count()
  + "," + spark.read.parquet("/tmp/sf1/embeddings.parquet").count())
