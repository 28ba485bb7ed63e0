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

  /** Per-`byCol` mean vector: `(by, n_vecs, centroid)` with the centroid
    * rounded at 6 decimals per element.
    *
    * The final per-element rounding is EXACT INTEGER arithmetic in
    * micro-units (su = Σ·10⁶ as BIGINT, half-away division by n), not
    * `round(s/n, 6)` on a double: a mean landing on a 7th-digit half
    * boundary (e.g. 0.0032135) rounds differently across engines when
    * computed through binary doubles (Spark rounds the shortest decimal
    * repr, DuckDB the scaled binary — observed flipping one component
    * at sf0.1). Integer half-away on the exact rational is
    * engine-identical by construction.
    */
  def meanVectors(emb: DataFrame, byCol: String,
                  vecCol: String = "embedding"): DataFrame = {
    val perDim = emb
      .select(col(byCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col(byCol), col("pos"))
      .agg(sum(round(col("x").cast("double"), 6).cast("decimal(25,6)")).as("sdec"),
        count(lit(1)).as("n"))
      .withColumn("su", (col("sdec") * lit(1000000)).cast("long"))
      // half-away-from-zero rounding of su/n via nonnegative integer
      // division only (DuckDB's // floors, Spark's DIV truncates — they
      // agree on nonnegatives, so the sign is factored out first)
      .withColumn("mm", expr(
        "CASE WHEN su < 0 THEN -((-su * 2 + n) DIV (2 * n)) " +
          "ELSE (su * 2 + n) DIV (2 * n) END"))
      .withColumn("m", col("mm").cast("double") / lit(1000000.0))
    perDim
      .groupBy(col(byCol))
      .agg(
        max(col("n")).as("n_vecs"),
        // struct sort on (pos, …) reassembles dimension order; ragged
        // inputs already divided by their own per-dim contributor count
        transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          e => e.getField("m")).as("centroid"))
      .select(col(byCol), col("n_vecs"), col("centroid"))
  }
}
