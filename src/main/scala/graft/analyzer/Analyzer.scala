package graft.analyzer

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text normalization shared by the corpus-ingest and query paths.
  *
  * The single most important semantic invariant of the reference system is
  * that documents and queries go through the *same* analyzer chain
  * (reference: `app/prepare_data.py:22-29` and `app/query.py:25`):
  * lowercase → strip non-`[a-z0-9\s]` to space → collapse whitespace →
  * split on whitespace, dropping empty tokens (Python `str.split()`
  * semantics, `mapreduce/mapper1.py:14`).
  *
  * Everything here is a pure `Column` expression — whole-stage-codegen'd,
  * no UDFs — so the analyzer fuses into the surrounding scan/aggregate
  * stages and costs no extra pass at any scale.
  */
object Analyzer {

  /** `[^a-z0-9\s]` — anything that is not lowercase-alnum or whitespace. */
  private[graft] val NonAlnum = "[^a-z0-9\\s]"
  private[graft] val MultiWs  = "\\s+"

  /** Lowercase, strip punctuation to spaces, collapse runs of whitespace,
    * trim. The trim makes Java `split` semantics match Python
    * `str.split()` (no leading empty token — SURVEY.md §7.4).
    */
  def normText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), NonAlnum, " "), MultiWs, " "))

  /** Tokenize into an array column; empty/whitespace-only input yields an
    * empty array (not `[""]`), matching Python `"".split() == []`.
    * The empty-token filter (rather than a `when(norm === "")` guard)
    * keeps exactly ONE evaluation of the regex chain per row — a guard
    * would embed `normText` twice and double the analyzer cost of every
    * downstream operator.
    */
  def tokens(c: Column): Column =
    filter(split(normText(c), " "), t => t =!= "")

  /** Number of tokens in a text column — the reference's per-document
    * "length" (`mapreduce/mapper1.py:14-18`), computed without
    * materializing the token array.
    */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** Driver-side analyzer for query strings — must agree exactly with
    * [[normText]]/[[tokens]] so that query terms line up with indexed
    * terms (reference invariant, `app/query.py:25`).
    */
  def analyzeQuery(text: String): Seq[String] =
    // Locale.ROOT: executor-side lower() is locale-independent; default-
    // locale toLowerCase would map 'I' to dotless 'ı' on a Turkish JVM
    // and break query/index analyzer parity.
    text.toLowerCase(java.util.Locale.ROOT)
      .replaceAll(NonAlnum, " ")
      .trim
      .split(MultiWs)
      .toSeq
      .filter(_.nonEmpty)
}
