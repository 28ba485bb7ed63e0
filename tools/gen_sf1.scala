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
(parts.reduce(_ unionByName _).repartition(32)
  .write.mode("overwrite").parquet("/tmp/sf1/documents.parquet"))
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
(eParts.reduce(_ unionByName _).repartition(32)
  .write.mode("overwrite").parquet("/tmp/sf1/embeddings.parquet"))
// relational + event tables (VERDICT r15 #6): replica i shifts every
// PRIMARY and FOREIGN key by (max+1)*i — referential integrity holds
// within each replica, so joins scale as 10 disjoint TPC-H-shaped
// universes (10x probe rows on both sides, no artificial fan-out).
// region/nation stay fixed (TPC-H dimension tables are constant at any
// SF; every replica's nationkeys resolve against the one copy).
// events keep their timestamps: 10x rows per time window is exactly the
// 10x shape the window/session/streaming families pay at scale.
val sfDir = "/root/testdata/sf0.1"
// shared key spaces shift by the SAME modulus on every referencing side:
// customer/orders share custkey, orders/lineitem share orderkey, etc.
// NOTE every multi-line statement here is brace-wrapped: the REPL's -I
// loader evaluates a line that parses complete and treats a following
// leading-dot line as a chain on the previous RESULT — a two-line
// `val x = read(...)` + `.agg(...)` binds x to the DataFrame and
// silently discards the aggregation (exactly how the first run of this
// script produced a fixture with no relational tables).
def keyMax(name: String, k: String): Long = {
  spark.read.parquet(s"$sfDir/$name.parquet").agg(max(col(k))).head.getLong(0) + 1L
}
val custMax = keyMax("customer", "c_custkey")
val suppMax = keyMax("supplier", "s_suppkey")
val partMax = keyMax("part", "p_partkey")
val ordMax = keyMax("orders", "o_orderkey")
def rep10Keyed(name: String, shifts: Map[String, Long]): Unit = {
  val t = spark.read.parquet(s"$sfDir/$name.parquet")
  val parts = (0 until 10).map { i =>
    shifts.foldLeft(t) { case (df, (k, m)) =>
      if (i == 0) df else df.withColumn(k, col(k) + lit(m * i)) }
  }
  parts.reduce(_ unionByName _).repartition(32)
    .write.mode("overwrite").parquet(s"/tmp/sf1/$name.parquet")
}
rep10Keyed("customer", Map("c_custkey" -> custMax))
rep10Keyed("supplier", Map("s_suppkey" -> suppMax))
rep10Keyed("part", Map("p_partkey" -> partMax))
rep10Keyed("orders", Map("o_orderkey" -> ordMax, "o_custkey" -> custMax))
rep10Keyed("lineitem", Map("l_orderkey" -> ordMax, "l_partkey" -> partMax,
  "l_suppkey" -> suppMax))
rep10Keyed("events", Map("event_id" -> keyMax("events", "event_id"),
  "user_id" -> keyMax("events", "user_id")))
for (dim <- Seq("region", "nation")) {
  spark.read.parquet(s"$sfDir/$dim.parquet").write.mode("overwrite").parquet(s"/tmp/sf1/$dim.parquet")
}
println("SF1ROWS=" + spark.read.parquet("/tmp/sf1/documents.parquet").count()
  + "," + spark.read.parquet("/tmp/sf1/embeddings.parquet").count()
  + "," + spark.read.parquet("/tmp/sf1/lineitem.parquet").count()
  + "," + spark.read.parquet("/tmp/sf1/events.parquet").count())
