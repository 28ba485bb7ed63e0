package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal binary-column surface: documents' text payloads stand in
  * for media bytes (no codecs in this container — see
  * [[graft.multimodal.Multimodal]] for the stub contract). The metadata
  * path is declarative and oracle-backed; byte-level feature extraction
  * exercises the real `mapPartitions` plumbing (rows-only check).
  */
object MediaQueries extends QueryGroup {

  private def media(s: SparkSession, dir: String) =
    Multimodal.asMedia(Tables.load(s, dir, "documents"), "doc_id", "text")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_meta" -> ((s, dir) => Multimodal.mediaMeta(media(s, dir))),

    "q_media_features" -> ((s, dir) => {
      implicit val spark: SparkSession = s
      import s.implicits._
      Multimodal.extractFeatures(media(s, dir).as[Multimodal.MediaRow]).toDF()
    }),
  )

  def oracles: Map[String, String] = Map(
    "q_media_meta" ->
      """SELECT doc_id AS media_id, 'text/plain' AS media_type,
                octet_length(encode(text)) AS n_bytes,
                text IS NULL AS is_missing
         FROM documents""",

    // The stub features are plain byte arithmetic over the payload, so
    // DuckDB can recompute them from a hex expansion of the same bytes:
    // byte i = 16*hi + lo via a hex-digit strpos lookup; entropy proxy =
    // total popcount / total bits. LEFT JOIN keeps empty payloads with
    // the same (0, -1, 0.0) defaults the mapPartitions stub emits.
    "q_media_features" ->
      """WITH b AS (SELECT doc_id AS media_id, hex(encode(text)) AS hx,
                           octet_length(encode(text)) AS n FROM documents),
              byt AS (SELECT media_id, n, i,
                             (strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1) * 16 +
                             (strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1) AS byte
                      FROM b, LATERAL (SELECT unnest(range(1, n + 1)) AS i) t),
              agg AS (SELECT media_id, CAST(sum(byte) AS BIGINT) AS byte_sum,
                             CAST(sum(bit_count(byte)) AS BIGINT) AS ones,
                             CAST(max(CASE WHEN i = 1 THEN byte END) AS INT) AS head_byte
                      FROM byt GROUP BY media_id)
         SELECT b.media_id, CAST(b.n AS BIGINT) AS n_bytes,
                coalesce(a.byte_sum, 0) AS byte_sum,
                coalesce(a.head_byte, -1) AS head_byte,
                CASE WHEN b.n = 0 THEN 0.0
                     ELSE CAST(a.ones AS DOUBLE) / (b.n * 8.0) END AS entropy_proxy
         FROM b LEFT JOIN agg a USING (media_id)""",
  )
}
