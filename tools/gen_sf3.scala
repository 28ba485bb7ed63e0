// Generate /tmp/sfr10 (10x) and /tmp/sfr30 (30x vs sf0.1) fixtures —
// DOCUMENTS + EMBEDDINGS ONLY — for the three-point (1x/10x/30x)
// scaling check on the linear-tail families (VERDICT r16 #6).
//
// Documents replicate exactly as tools/gen_sf1.scala (token-prefixed
// disjoint vocabulary per replica: N independent corpora).
//
// Embeddings must NOT replicate identically here: gen_sf1's
// identical-payload replicas are right for IVF/ANN cost (row count and
// list sizes drive it; identical payloads keep probe answers
// deterministic) but PATHOLOGICAL for embedding near-dup — every
// original near-dup pair fans out replicas^2 cross-replica pairs, so
// the workload grows quadratically in replicas, not linearly in rows
// (measured: the identical-replica 30x point spilled to
// SparkOutOfMemoryError after 692 s — by construction, not by scale).
// Instead each replica CIRCULAR-SHIFTS the vector components by its
// replica index: within-replica cosines are EXACTLY replica 0's (same
// per-replica near-dup structure, same work), cross-replica cosines
// decorrelate — N independent corpora, the same law as the documents.
// NOTE multi-line statements are paren/brace-wrapped for the -I loader
// (see gen_sf1.scala's note on leading-dot chains).
import org.apache.spark.sql.functions._
val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
val maxId = d.agg(max("doc_id")).head.getLong(0)
val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
val maxVid = e.agg(max("vec_id")).head.getLong(0)
val dim = e.select(size(col("embedding"))).head.getInt(0)

def gen(nRep: Int, out: String): Unit = {
  val parts = (0 until nRep).map { i =>
    if (i == 0) d
    else d.withColumn("doc_id", col("doc_id") + lit((maxId + 1L) * i))
      .withColumn("text", array_join(
        transform(split(col("text"), " "), t => concat(lit("r" + i), t)), " "))
      .withColumn("n_chars", length(col("text")).cast(d.schema("n_chars").dataType))
  }
  (parts.reduce(_ unionByName _).repartition(32)
    .write.mode("overwrite").parquet(s"$out/documents.parquet"))
  val eParts = (0 until nRep).map { i =>
    if (i == 0) e
    else e.withColumn("vec_id", col("vec_id") + lit((maxVid + 1L) * i))
      // circular shift by i: embedding[(j + i) % dim] — norm-preserving,
      // within-replica geometry identical to replica 0
      .withColumn("embedding", transform(sequence(lit(0), lit(dim - 1)),
        j => element_at(col("embedding"), (j + lit(i)) % lit(dim) + lit(1))))
  }
  (eParts.reduce(_ unionByName _).repartition(32)
    .write.mode("overwrite").parquet(s"$out/embeddings.parquet"))
  println(s"SFROWS $out=" +
    spark.read.parquet(s"$out/documents.parquet").count() + "," +
    spark.read.parquet(s"$out/embeddings.parquet").count())
}
gen(10, "/tmp/sfr10")
gen(30, "/tmp/sfr30")
