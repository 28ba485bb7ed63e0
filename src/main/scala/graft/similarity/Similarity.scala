package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), using only higher-order column functions — the dot
  * product and norms fold inside whole-stage codegen; no UDFs.
  *
  * Scale design: [[bruteForceTopK]] broadcasts the (small) query set and
  * scans the corpus once — O(corpus × queries) multiply-adds, embarrassingly
  * parallel, per-partition top-k via window-free TakeOrdered when k is
  * global or window row_number per query (shuffle on query_id). For
  * corpus-scale ANN, [[signBuckets]] assigns each vector to a
  * random-hyperplane sign bucket; the bucketed join touches only
  * same-bucket candidates (tunable recall via `nPlanes` and multi-probe).
  */
object Similarity {

  /** Sequential left-fold dot product of two float arrays as double —
    * element order fixed, so the result is bit-deterministic. Declarative
    * reference implementation; the hot paths use [[dotFast]]. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Codegen'd dot product (custom Catalyst expression) — bit-identical
    * to [[dot]] (same left-to-right double accumulation) but a primitive
    * loop with no per-row array allocation. */
  def dotFast(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.dotF(a, b)

  def norm(a: Column): Column = sqrt(dotFast(a, a))

  def cosine(a: Column, b: Column): Column = dotFast(a, b) / (norm(a) * norm(b))

  /** Cosine from a precomputed-norm layout: at N·M pair volume this does
    * one dot per pair instead of three. */
  def cosinePrenormed(a: Column, b: Column, normA: Column, normB: Column): Column =
    dotFast(a, b) / (normA * normB)

  /** Exact top-k neighbors for each query vector: `(query_id, vec_id, cos,
    * rank)`, self-matches excluded, ties broken by vec_id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v"),
      norm(col(vecCol)).as("nv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("nq"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosinePrenormed(col("v"), col("qv"), col("nv"), col("nq")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("cos"), col("rank").cast("long").as("rank"))
  }

  /** Deterministic pseudo-random hyperplanes (seeded), as literal arrays —
    * no data dependency, broadcast as constants into codegen. */
  private def planes(nPlanes: Int, dim: Int, seed: Long): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-LSH bucket id for a vector column: bit p = sign(v · plane_p). */
  def signBucket(v: Column, nPlanes: Int = 12, dim: Int = 64, seed: Long = 42L): Column =
    planes(nPlanes, dim, seed).zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.toIndexedSeq.map(lit): _*)
      when(dot(v, planeLit) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** IVF-style ANN: corpus vectors are assigned to their nearest of
    * `nCentroids` centroid vectors (deterministically seeded from the
    * lowest-id corpus vectors — a production build would run k-means
    * refinement); a query probes its `nProbe` nearest centroid lists
    * only. Candidate volume ≈ corpus·nProbe/nCentroids per query.
    * Output shape matches [[bruteForceTopK]]; recall is the IVF curve.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = broadcast(
      corpus.orderBy(col(idCol)).limit(nCentroids)
        .select(col(idCol).as("cent_src"), col(vecCol).as("cvec"))
        .withColumn("cid", row_number().over(Window.orderBy(col("cent_src"))))
        .select("cid", "cvec"))

    def assigned(df: DataFrame, id: String, v: String, keep: Int): DataFrame = {
      val scored = df.crossJoin(cents)
        .withColumn("cdist", lit(1.0) - cosine(col(v), col("cvec")))
      if (keep == 1)
        scored.groupBy(col(id), col(v))
          .agg(min_by(col("cid"), col("cdist")).as("cid"))
      else {
        val w = Window.partitionBy(col(id)).orderBy(col("cdist").asc, col("cid").asc)
        scored.withColumn("r", row_number().over(w)).filter(col("r") <= keep)
          .select(col(id), col(v), col("cid"))
      }
    }

    val c = assigned(corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v")),
      "vec_id", "v", keep = 1)
      .withColumn("nv", norm(col("v")))
    val q = assigned(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
      "query_id", "qv", keep = nProbe)
      .withColumn("nq", norm(col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    c.join(broadcast(q), "cid")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosinePrenormed(col("v"), col("qv"), col("nv"), col("nq")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cos", "rank")
  }

  /** ANN top-k via sign-LSH bucketing: candidates = same-bucket vectors
    * (approximate — recall grows as nPlanes shrinks). Output shape matches
    * [[bruteForceTopK]].
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nPlanes: Int = 12, dim: Int = 64,
              idCol: String = "vec_id", vecCol: String = "embedding",
              probeBits: Int = 0): DataFrame = {
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v"),
      norm(col(vecCol)).as("nv"),
      signBucket(col(vecCol), nPlanes, dim).as("bucket"))
    // multi-probe: a near neighbor on the far side of one hyperplane
    // lands in a 1-bit-flipped bucket — probe those too (probeBits=1
    // multiplies candidates by nPlanes+1 and sharply lifts recall).
    val baseQ = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("nq"),
      signBucket(col(vecCol), nPlanes, dim).as("bucket"))
    val q =
      if (probeBits == 0) baseQ
      else baseQ.withColumn("bucket",
        explode(array(col("bucket") +:
          (0 until nPlanes).map(i => col("bucket").bitwiseXOR(lit(1L << i))): _*)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    c.join(broadcast(q), "bucket")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosinePrenormed(col("v"), col("qv"), col("nv"), col("nq")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cos", "rank")
  }
}
