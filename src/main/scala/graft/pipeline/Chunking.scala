package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.analyzer.Analyzer

/** Document chunking — fixed-size token windows with overlap, the prep
  * step that turns long documents into embedding/context-window-sized
  * pieces. Chunk k starts at token `k·stride` (stride = size − overlap),
  * so consecutive chunks share `overlap` tokens; the final chunk may be
  * shorter. Empty documents produce no chunks.
  *
  * Scale: pure per-row generation — tokenize, compute the start-index
  * sequence, slice, explode. Fuses into the corpus scan with no
  * shuffle; output rows ∝ total tokens / stride. Chunk ids are
  * deterministic (position within the document), so downstream joins
  * (chunk ↔ embedding) are stable across runs.
  */
object Chunking {

  /** `(doc_id, chunk_id, n_tokens, chunk)` — chunk text re-joined with
    * single spaces (analyzer-normalized tokens carry no whitespace). */
  def chunkTokens(df: DataFrame, chunkSize: Int, overlap: Int,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got $overlap")
    val stride = chunkSize - overlap
    df.select(col(idCol).as("doc_id"), Analyzer.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(1), size(col("toks")), lit(stride)),
          st => slice(col("toks"), st, lit(chunkSize)))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
        size(col("col")).cast("long").as("n_tokens"),
        array_join(col("col"), " ").as("chunk"))
  }

  /** Content-defined chunking: a chunk boundary opens AFTER any token
    * whose portable hash is ≡ 0 (mod `modulus`) — boundaries depend on
    * CONTENT, not position, so inserting a sentence shifts at most the
    * chunk it lands in while fixed-size windows shift every later chunk
    * (the property that makes CDC chunks dedup-friendly across document
    * revisions; expected chunk length ≈ `modulus` tokens).
    *
    * Returns `(doc_id, chunk_id, n_tokens, fingerprint)` — fingerprint
    * is the portable hash of the space-joined chunk text (order-
    * sensitive), the join key for chunk-level dedup across documents.
    *
    * Scale: tokenize + hash fuse into the scan; the running boundary
    * count is ONE window over the doc-keyed order (high-cardinality
    * partition key), then a (doc, chunk) aggregate whose collect state
    * is bounded by chunk length. Everything exchanges on doc ids.
    */
  def contentDefinedChunks(df: DataFrame, modulus: Int = 32,
                           idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    chunkAssignments(df, modulus, idCol, textCol)
      .groupBy("doc_id", "chunk_id")
      .agg(count(lit(1)).as("n_tokens"),
        Sampling.saltedHash("cdcfp", chunkTextAgg).as("fingerprint"))

  /** `(doc_id, pos, term, chunk_id)` — every token tagged with its
    * content-defined chunk (see [[contentDefinedChunks]] for the
    * boundary rule and the scale posture). */
  private def chunkAssignments(df: DataFrame, modulus: Int,
                               idCol: String, textCol: String): DataFrame = {
    require(modulus >= 2, s"modulus must be >= 2, got $modulus")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.select(col(idCol).as("doc_id"),
        posexplode(Analyzer.tokens(col(textCol))).as(Seq("pos", "term")))
      .withColumn("boundary",
        (pmod(Sampling.saltedHash("cdc", col("term")), lit(modulus.toLong)) === 0)
          .cast("long"))
      // chunk id = boundaries strictly BEFORE this token (a boundary
      // token closes its own chunk)
      .withColumn("chunk_id", coalesce(sum(col("boundary")).over(w), lit(0L)))
  }

  /** Chunk text rebuilt in token order inside a (doc, chunk) aggregate
    * (collect_list order is nondeterministic; the sort restores it). */
  private def chunkTextAgg: org.apache.spark.sql.Column =
    array_join(transform(array_sort(collect_list(struct(col("pos"), col("term")))),
      e => e.getField("term")), " ")

  /** Cross-document chunk dedup — boilerplate removal at chunk
    * granularity: any content-defined chunk whose text occurs in at
    * least `minDocs` DISTINCT documents is dropped from ALL of them
    * (repeated-content semantics: headers, license blocks, mirrored
    * passages), and each document is reassembled from its surviving
    * chunks in order. Returns
    * `(doc_id, n_chunks, dropped_chunks, clean_text)`; a document whose
    * chunks were all shared comes back with empty `clean_text`, and a
    * document with no shared chunks reassembles to exactly its
    * normalized text (spec-asserted). Shift-robust boundaries
    * ([[contentDefinedChunks]]) are what make the chunk-text equality
    * meaningful across revised/near-dup documents.
    *
    * Scale: chunking work as in [[contentDefinedChunks]]; the dedup
    * decision shuffles only (fingerprint, doc) pairs for the
    * distinct-doc count, then chunk rows re-shuffle by doc for
    * reassembly — state per (doc, chunk) bounded by chunk length,
    * per fingerprint by its doc count.
    */
  def chunkDedupClean(df: DataFrame, modulus: Int = 32, minDocs: Int = 2,
                      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val chunks = chunkAssignments(df, modulus, idCol, textCol)
      .groupBy("doc_id", "chunk_id")
      .agg(chunkTextAgg.as("chunk"))
      .withColumn("fp", Sampling.saltedHash("cdcfp", col("chunk")))
    val shared = chunks.groupBy("fp").agg(countDistinct(col("doc_id")).as("n_docs"))
    chunks.join(shared, "fp")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("n_docs") >= minDocs, 1L).otherwise(0L)).as("dropped_chunks"),
        array_join(transform(array_sort(collect_list(
            when(col("n_docs") < minDocs, struct(col("chunk_id"), col("chunk"))))),
          e => e.getField("chunk")), " ").as("clean_text"))
  }
}
