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
  )
}
