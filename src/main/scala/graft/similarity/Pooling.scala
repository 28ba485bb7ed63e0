package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding pooling — the mean vector per group (class prototypes,
  * cluster centroids, user/session embeddings from event embeddings):
  * the aggregation every representation-learning pipeline runs after
  * encoding.
  *
  * Shape: `posexplode` each vector, two-phase aggregate per
  * `(group, dim)`, reassemble ordered arrays. The map side combines to
  * ≤ |groups|·d entries per task regardless of row count, so the
  * exchange carries group-cardinality × dimension, never vectors — the
  * same partial-aggregation argument as every other agg here, applied
  * per dimension. (A d-length-array typed Aggregator would shuffle the
  * same volume in fewer rows; the per-dim form keeps the sums in plain
  * codegen'd columns and the oracle trivially portable.)
  *
  * Determinism discipline (oracle gate): per-dim contributions are
  * rounded at 6 decimals and summed as DECIMAL(25,6) — partition-order
  * independent, engine-portable (the float→double widening is exact).
  */
object Pooling {

  /** Exact decimal sum of `round(expr, 6)` — order-independent. */
  private def dsum6(e: Column): Column =
    sum(round(e, 6).cast("decimal(25,6)")).cast("double")

  /** Per-`byCol` mean vector: `(by, n_vecs, centroid)` with the centroid
    * rounded at 6 decimals per element. */
  def meanVectors(emb: DataFrame, byCol: String,
                  vecCol: String = "embedding"): DataFrame = {
    val perDim = emb
      .select(col(byCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col(byCol), col("pos"))
      .agg(dsum6(col("x").cast("double")).as("s"), count(lit(1)).as("n"))
    perDim
      .groupBy(col(byCol))
      .agg(
        max(col("n")).as("n_vecs"),
        // struct sort on (pos, …) reassembles dimension order; ragged
        // inputs keep per-dim n in the struct so every element divides
        // by its own contributor count
        transform(array_sort(collect_list(struct(col("pos"), col("s"), col("n")))),
          e => round(e.getField("s") / e.getField("n"), 6)).as("centroid"))
      .select(col(byCol), col("n_vecs"), col("centroid"))
  }
}
