package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph computation over a pair list — PageRank with a fixed
  * iteration count, the weighted companion of
  * [[graft.dedup.Dedup.duplicateClusters]]'s connected components (e.g.
  * ranking documents inside a near-duplicate cluster by how central they
  * are to the duplication pattern, instead of min-id survivorship).
  *
  * Determinism discipline: each iteration's neighbor contributions are
  * rounded at 6 decimals and summed as DECIMAL(25,6) — the per-node
  * contribution sum is partition-order independent, so `iters` rounds
  * stay bit-identical across engines/partitionings and the whole
  * iteration unrolls into a plain SQL oracle.
  *
  * Scale: per iteration one src-keyed join (ranks onto edges) and one
  * dst-keyed aggregate — both exchanges on node ids, no driver-side
  * state. `localCheckpoint` cuts the lineage each round, keeping the
  * plan O(1) in iterations (SCALE.md, cluster-labeling note). Fixed
  * small `iters` (rank mass converges geometrically at `damping`^t;
  * ranking stabilizes long before the values do).
  */
object Graph {

  /** Exact decimal sum of `round(expr, 6)` — order-independent. */
  private def dsum6(e: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(round(e, 6).cast("decimal(25,6)")).cast("double")

  /** PageRank over the undirected graph given as a pair list; returns
    * `(id, rank)` for every node that appears in a pair. */
  def pageRank(pairs: DataFrame, aCol: String, bCol: String,
               iters: Int = 3, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // the pair list may carry an arbitrarily expensive lineage (e.g. the
    // whole MinHash pipeline) — materialize the edge list ONCE; every
    // iteration then reads the checkpointed rows, not the upstream plan
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .localCheckpoint(true)
    val deg = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    var ranks = deg.select(col("id"), lit(1.0).as("r"))
    for (_ <- 0 until iters) {
      val contribs = edges
        .join(deg.select(col("id").as("src"), col("deg")), "src")
        .join(ranks.select(col("id").as("src"), col("r")), "src")
        .groupBy(col("dst").as("id"))
        .agg(dsum6(col("r") / col("deg")).as("contrib"))
      ranks = deg.select(col("id"))
        .join(contribs, Seq("id"), "left_outer")
        .select(col("id"),
          (lit(1.0 - damping) + lit(damping) * coalesce(col("contrib"), lit(0.0))).as("r"))
        .localCheckpoint(true)
    }
    ranks
  }

  /** Per-node triangle participation count over an undirected pair list.
    * Triangles measure local clustering — in a near-duplicate graph they
    * separate tight duplicate cliques (every pair agrees) from chains of
    * borderline matches (transitive false positives), the standard
    * post-LSH diagnostic before trusting cluster survivorship.
    *
    * Shape: edges canonicalized to `a < b`; a triangle `a < b < c` is
    * found once as e1=(a,b) ⋈ e2=(b,c) ⋈ e3=(a,c) — three equi-joins on
    * node ids, no enumeration of wedges beyond what the (b)-keyed join
    * produces. Scale: wedge volume is Σ_b deg(b)², the unavoidable lower
    * bound; joins shuffle on node ids, and the duplicate-graph degrees
    * are bounded by cluster sizes, not corpus size.
    */
  def triangleCounts(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = pairs.select(
        least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .distinct()
      .localCheckpoint(true) // pairs may carry the whole LSH lineage
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_triangles"))
  }
}
