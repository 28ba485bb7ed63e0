package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.index.Indexer
import graft.queries._
import graft.search.BM25

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query groups live under [[graft.queries]]; each group exposes a
  * `queries` map (name → (spark, sfDir) => DataFrame) and an `oracles`
  * map (name → DuckDB SQL over the same parquet tables). Groups:
  *
  *   - [[SearchQueries]]     — reference parity: analyzer, inverted index,
  *                             BM25 ranking, store lifecycles (§2.1–2.8)
  *   - [[RelationalQueries]]  — join/agg/window/function breadth
  *   - [[PipelineQueries]]    — dedup, ANN, text analysis, sampling,
  *                             decontamination, quality funnel
  *   - [[EventQueries]]       — event-time windows, temporal joins, and
  *                             the streaming-runtime gate twins
  *   - [[MediaQueries]]       — multimodal metadata/features
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * End-to-end reference pipeline through the PRODUCTION retrieval
    * lifecycle: corpus → index → persisted bucketed store → pruned
    * store scan → BM25 top-10 (not an in-memory shortcut).
    */
  def entry(spark: SparkSession): DataFrame = {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val store = QueryGroup.scratchDir("graft-entry-store")
    Indexer.writeIndex(Indexer.buildIndex(docs, titleCol = Some("source")), store)
    BM25.searchStore(spark, store, SearchQueries.FlagshipQuery)
  }

  private val groups: Seq[QueryGroup] = Seq(
    SearchQueries,
    RelationalQueries,
    PipelineQueries,
    EventQueries,
    MediaQueries,
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.map(_.queries).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    groups.map(_.oracles).reduce(_ ++ _)
}
