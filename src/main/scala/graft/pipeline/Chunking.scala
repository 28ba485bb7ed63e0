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
}
