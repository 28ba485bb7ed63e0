package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: reciprocal-rank fusion (RRF) of independently
  * produced per-query rankings — the standard way to combine a lexical
  * ranking (BM25 / sparse TF-IDF through the inverted index) with a
  * dense embedding ranking (brute / LSH / IVF) without score
  * calibration: ranks are comparable across modalities even when the
  * scores are not.
  *
  * {{{
  *   fused(q, d) = Σ_lists 1 / (rrfK + rank_list(q, d))
  * }}}
  *
  * Scale design: the inputs are already top-k-per-query lists (≤
  * lists·k rows per query — bounded, independent of corpus size), so
  * fusion is a union plus one small grouped aggregate; the heavy
  * lifting stays in the per-modality retrievers, each using its own
  * index access path (term-bucketed inverted store, cid-partitioned IVF
  * lists). Nothing here rescans the corpus. Per-(query, doc)
  * contributions are rounded and decimal-summed, so the fused score is
  * partition-order independent and engine-portable (the repo-wide
  * oracle discipline, see SCALE.md).
  */
object HybridRetrieval {

  /** Fuse labeled rankings. Every input needs `(query_id, doc_id,
    * rank)` columns (rank 1-based, unique per (query, doc) within one
    * list — the shape all graft retrievers emit). Output: one
    * `<label>_rank` column per input (null where that list missed the
    * doc), the fused `rrf` score (rounded at 6), and the fused 1-based
    * `rank`, top `k` per query, ties broken by `doc_id`.
    */
  def rrfFuse(rankings: Seq[(String, DataFrame)], k: Int, rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val labels = rankings.map(_._1)
    require(labels.distinct.size == labels.size,
      s"duplicate ranking labels: ${labels.mkString(", ")}")
    require(rrfK >= 1, s"rrfK must be >= 1, got $rrfK")

    val tagged = rankings.map { case (label, df) =>
      df.select(col("query_id"), col("doc_id"),
        col("rank").cast("long").as("rank"), lit(label).as("src"))
    }.reduce(_ unionByName _)

    // decimal partial sums: identical in any partition / merge order and
    // bit-reproducible in the SQL oracle (1/(rrfK+rank) is rational but
    // not binary-exact; the round-then-decimal discipline pins it)
    val contrib = round(lit(1.0) / (lit(rrfK) + col("rank")), 9)
      .cast("decimal(25,9)")
    val perSrcRank = labels.map(l =>
      max(when(col("src") === l, col("rank"))).as(s"${l}_rank"))
    val fused = tagged
      .groupBy("query_id", "doc_id")
      .agg(sum(contrib).cast("double").as("rrf"), perSrcRank: _*)

    val top = org.apache.spark.sql.graft.TopKOps.topKPerKey(fused,
      keys = Seq("query_id"), order = Seq("rrf" -> false, "doc_id" -> true), k)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select(Seq(col("query_id"), col("doc_id"),
          round(col("rrf"), 6).as("rrf")) ++
        labels.map(l => col(s"${l}_rank")) :+ col("rank"): _*)
  }
}
