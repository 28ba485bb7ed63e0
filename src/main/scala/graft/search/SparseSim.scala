package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.index.Indexer

/** Sparse TF-IDF document similarity through the inverted index — the
  * sparse-vector twin of the dense ANN family ([[graft.similarity]]):
  * document vectors are TF-IDF weights over the postings table, and a
  * bounded query set retrieves its top-k cosine neighbors by joining on
  * SHARED TERMS only — cost ∝ the query terms' postings lists, never a
  * corpus×corpus pair product (the same access-path argument as BM25
  * retrieval, reference `app/query.py`, with cosine in place of BM25).
  *
  * Determinism discipline (oracle gate): per-term weight products and
  * squared norms are rounded at 6 decimals and summed as DECIMAL(25,6),
  * so every dot product and norm is partition-order independent and
  * engine-portable (ln outputs are irrational — never near a rounding
  * boundary; see SCALE.md and the q_lm_score precedent).
  *
  * Scale: the idf weights join is postings ⋈ vocab on `term`; the query
  * side broadcasts (bounded query set); the per-(query, doc) aggregate is
  * two-phase. A df-cap (drop terms with df > frac·N before the join)
  * bounds the hottest postings lists at web scale — common terms carry
  * negligible idf weight anyway; it is exposed as `dfCapFrac` and left at
  * 1.0 on the gate because the synthetic fixture's 31-term vocabulary
  * would otherwise collapse to one dimension.
  */
object SparseSim {

  /** TF-IDF weights from prebuilt index tables: `(doc_id, term, w)` with
    * `w = tf · ln(N/df)`, keeping terms with `df <= dfCapFrac · N`. */
  def tfidfWeightsFrom(postings: DataFrame, vocab: DataFrame, n: Double,
                       dfCapFrac: Double = 1.0): DataFrame =
    postings.join(vocab.filter(col("df") <= lit(dfCapFrac * n)), "term")
      .select(col("doc_id"), col("term"),
        (col("tf").cast("double") * log(lit(n) / col("df").cast("double"))).as("w"))

  /** TF-IDF weights built from a raw corpus (index computed inline). */
  def tfidfWeights(corpus: DataFrame, dfCapFrac: Double = 1.0): DataFrame = {
    val post = Indexer.postings(corpus)
    val vocab = Indexer.vocab(post)
    val n = corpus.count().toDouble // one driver scalar, not per-row work
    tfidfWeightsFrom(post, vocab, n, dfCapFrac)
  }

  /** Exact decimal sum of `round(expr, 6)` — order-independent. */
  private def dsum6(e: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(round(e, 6).cast("decimal(25,6)")).cast("double")

  /** Top-`k` cosine neighbors per query document, computed through the
    * index: only (query, doc) pairs sharing a retained term are scored. */
  def tfidfTopK(corpus: DataFrame, queryIds: Seq[Long], k: Int,
                dfCapFrac: Double = 1.0): DataFrame =
    topKFromWeights(tfidfWeights(corpus, dfCapFrac), queryIds, k)

  /** Same retrieval through a PERSISTED index store
    * ([[Indexer.writeIndex]] layout): postings/vocab are the stored
    * tables, and N comes from the stored `meta` — the single source of
    * truth once the index is persisted (a 1-row bounded-metadata read,
    * not a corpus recount per invocation). LIVE view like every other
    * store reader ([[Indexer.readIndexLive]]): a store carrying
    * soft-delete tombstones never returns (or scores against) dead docs
    * — vocab/meta are already live-maintained, and the postings
    * anti-join keeps the weights consistent with them. */
  def tfidfTopKStore(spark: org.apache.spark.sql.SparkSession, path: String,
                     queryIds: Seq[Long], k: Int,
                     dfCapFrac: Double = 1.0): DataFrame = {
    val ix = Indexer.readIndexLive(spark, path)
    val n = ix.meta.select(col("total_docs")).head().getLong(0).toDouble
    topKFromWeights(
      tfidfWeightsFrom(ix.postings.select("term", "doc_id", "tf"), ix.vocab,
        n, dfCapFrac),
      queryIds, k)
  }

  private def topKFromWeights(w: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val norms = w.groupBy("doc_id").agg(sqrt(dsum6(col("w") * col("w"))).as("nrm"))
    val qw = w.filter(col("doc_id").isin(queryIds: _*))
      .select(col("doc_id").as("query_id"), col("term"), col("w").as("qw"))
    val dots = w.join(broadcast(qw), "term")
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy("query_id", "doc_id")
      .agg(dsum6(col("w") * col("qw")).as("dot"))
    val qn = norms.select(col("doc_id").as("query_id"), col("nrm").as("qn"))
    val scored = dots
      .join(broadcast(qn), "query_id")
      .join(norms, "doc_id")
      .select(col("query_id"), col("doc_id"),
        (col("dot") / (col("qn") * col("nrm"))).as("cos"))
    org.apache.spark.sql.graft.TopKOps.topKPerKey(scored,
        keys = Seq("query_id"), order = Seq("cos" -> false, "doc_id" -> true), k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("doc_id").asc)).cast("long"))
      .select(col("query_id"), col("doc_id"), round(col("cos"), 6).as("cos"), col("rank"))
  }

  /** Top-`n` TF-IDF keywords per document — `(doc_id, term, w, rank)`,
    * `w = round(tf · ln(N/df), 6)`, ties by term. The per-doc summary a
    * training pipeline attaches as metadata (topical routing, mixture
    * labeling). Scale shape: the weights join is postings ⋈ vocab on
    * `term` (vocab broadcasts), ranking is TopKPerKey's bounded
    * per-group heaps — state ∝ n per doc, never the full term list; no
    * per-doc ordering issue since each weight is a pure product (no
    * float summation at all). */
  def keywords(corpus: DataFrame, n: Int, dfCapFrac: Double = 1.0): DataFrame = {
    val w = tfidfWeights(corpus, dfCapFrac)
      .withColumn("w", round(col("w"), 6))
    org.apache.spark.sql.graft.TopKOps.topKPerKey(w,
        keys = Seq("doc_id"), order = Seq("w" -> false, "term" -> true), n)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("w").desc, col("term").asc)).cast("long"))
      .select(col("doc_id"), col("term"), col("w"), col("rank"))
  }
}
