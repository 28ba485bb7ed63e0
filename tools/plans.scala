// Regenerates PLANS.md — run via tools/gen_plans.sh
import org.apache.spark.sql.execution.ExplainMode
val names = Seq(
  "q_bm25_search", "q_bm25_store", "q_agg_pricing", "q_nation_revenue",
  "q_dedup_minhash", "q_dedup_simhash", "q_dedup_embed", "q_topk_op",
  "q_bucketed_join", "q_asof_join", "q_time_tumbling", "q_decontaminate",
  "q_unpivot", "q_histogram", "q_corr_subq", "q_reservoir", "q_ngram_vocab",
  "q_incr_agg", "q_window_ntile", "q_fuzzy_join", "q_char_entropy",
  "q_profile", "q_chunk", "q_funnel",
  "q_phrase_search", "q_cooccur_pmi", "q_feature_hash", "q_equidepth",
  "q_triangles", "q_mmr_rerank", "q_transitions", "q_cohort_retention",
  "q_psi_drift", "q_linreg", "q_embed_quant", "q_big_orders",
  "q_cdc_chunk", "q_chunk_dedup", "q_dup_spans", "q_span_clean",
  "q_temperature_mix", "q_prep_pipeline", "q_prep_pipeline_staged",
  "q_prep_ingest", "q_prep_index",
  "q_store_fsck_incr", "q_ivf_fsck_incr", "q_dedup_fsck_incr",
  "q_dedup_repair", "q_ivf_repair", "q_vstore_repair",
  "q_vstore_fsck_incr", "q_stream_prep_ingest", "q_prep_ann",
  "q_bm25_batch", "q_bm25_batch_store", "q_stream_index_ingest",
  "q_phrase_batch_store", "q_prox_batch_store",
  // r12/r13 flagships: the doc-bucketed zero-exchange serving joins,
  // their positional twins, and the gate-covered compaction lifecycle
  "q_bm25_store_bucketed", "q_bm25_batch_store_bucketed", "q_store_compact",
  "q_phrase_store_bucketed", "q_prox_batch_store_bucketed",
  // r13 governance: the cross-store forget cascade's audit (detect
  // phase of the drift loop shows the surface full-outer joins)
  "q_pipeline_forget", "q_pipeline_drift",
  // r13 promotion: the merged shard store must keep the pruned-scan
  // serving plan (PartitionFilters on term_bucket over transferred
  // files) — the plan proves the file-level merge preserved layout
  "q_store_merge", "q_ann_ivf_merge",
  // r14/r15 endgame: the merged→doc-bucketed serving copy (exchange-free
  // scoring join over the promoted store), the recluster maintenance
  // verb (broadcast reassignment + partition-pruned probe after), and
  // the layered-shard merge (batch=/cid= layout preserved through the
  // remap — probing still pruned)
  "q_store_merge_bucketed", "q_ann_ivf_recluster", "q_ann_ivf_merge_stream",
  "q_ann_ivf_flatten",
  // r16: quantized shards through the merge (union probe must keep the
  // probed-cid partition pruning over the transferred int8 lists) and
  // the quantized deep audit (one cached lists pass, banded recompute)
  "q_ann_ivf_quant_merge", "q_ivf_fsck_quant")
val sb = new StringBuilder
sb.append("# PLANS - formatted physical plans (sf0.001)\n\n")
sb.append("Generated evidence artifacts for the flagship queries: what Catalyst\nactually plans for this engine's declarative code (pushdown, pruning,\nbroadcast choice, partial aggregation, TakeOrderedAndProject, custom\noperators). Regenerate with `tools/gen_plans.sh` after operator changes.\n")
for (n <- names) {
  val df = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
  sb.append(s"\n## $n\n\n```\n")
  sb.append(df.queryExecution.explainString(ExplainMode.fromString("formatted")).take(6000))
  sb.append("```\n")
}
java.nio.file.Files.writeString(java.nio.file.Paths.get("/root/repo/PLANS.md"), sb.toString)
println("WROTE=" + sb.length)
