package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-ranking: from a per-query candidate
  * list, iteratively select the item maximizing
  * `λ·rel − (1−λ)·max_{s∈selected} sim(c, s)` — relevance traded
  * against redundancy with what's already picked. The standard
  * diversity pass over an ANN result before showing/sampling it
  * (near-duplicate corpus neighbors otherwise fill the whole top-k).
  *
  * Determinism: `rel` and `sim` are expected PRE-ROUNDED (6 dp) by the
  * caller, so every comparison the selection makes is on values both
  * engines agree on bit-for-bit; ties break on `vec_id` ascending. The
  * fixed `k` selection unrolls into a plain SQL oracle exactly like
  * [[graft.operators.Graph.pageRank]]'s iterations.
  *
  * Scale: every frame in the loop is bounded by |queries|·k0 rows
  * (candidates) or |queries|·k0² (pair sims) — the expensive corpus
  * work happened upstream in the retriever; re-ranking never touches
  * the corpus again. Each of the `k` rounds is an equi-join + window
  * on the query key; `localCheckpoint` keeps the growing selection's
  * plan O(1) per round.
  */
object Mmr {

  /** Pairwise cosine similarities among each query's candidates:
    * `(query_id, a, b, sim)`, both directions, rounded to 6 dp.
    * Cost: |queries|·k² pairs — corpus-independent. */
  def candidatePairSims(cands: DataFrame, corpus: DataFrame,
                        idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val vecs = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      Similarity.norm(col(vecCol)).as("nv"))
    val withVec = cands.select(col("query_id"), col("vec_id"))
      .join(vecs, col("vec_id") === col("id"))
      .select(col("query_id"), col("vec_id"), col("v"), col("nv"))
    withVec.as("x").join(withVec.as("y"), Seq("query_id"))
      .filter(col("x.vec_id") =!= col("y.vec_id"))
      .select(col("query_id"), col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        round(Similarity.cosinePrenormed(
          col("x.v"), col("y.v"), col("x.nv"), col("y.nv")), 6).as("sim"))
  }

  /** Select `k` items per query by MMR from `cands (query_id, vec_id,
    * rel)` and `pairSims (query_id, a, b, sim)`; returns
    * `(query_id, step, vec_id)` with step 1..k in selection order. */
  def rerank(cands: DataFrame, pairSims: DataFrame, k: Int,
             lambda: Double = 0.7): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val c = cands.select(col("query_id"), col("vec_id"), col("rel"))
      .localCheckpoint(true)
    val sims = pairSims.localCheckpoint(true)
    val wPick = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    def pick(scored: DataFrame, step: Int): DataFrame =
      scored.withColumn("rn", row_number().over(wPick))
        .filter(col("rn") === 1)
        .select(col("query_id"), lit(step.toLong).as("step"), col("vec_id"))
    var sel = pick(c.withColumn("score", col("rel")), 1).localCheckpoint(true)
    for (i <- 2 to k) {
      val remaining = c.join(sel.select("query_id", "vec_id"),
        Seq("query_id", "vec_id"), "left_anti")
      val scored = remaining
        .join(sims.select(col("query_id"), col("a").as("vec_id"),
          col("b").as("sel_id"), col("sim")), Seq("query_id", "vec_id"))
        .join(sel.select(col("query_id"), col("vec_id").as("sel_id")),
          Seq("query_id", "sel_id"))
        .groupBy("query_id", "vec_id", "rel")
        .agg(max(col("sim")).as("msim"))
        .withColumn("score",
          lit(lambda) * col("rel") - lit(1.0 - lambda) * col("msim"))
      sel = sel.unionByName(pick(scored, i)).localCheckpoint(true)
    }
    sel
  }
}
