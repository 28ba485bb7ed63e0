package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan hygiene: the properties that make these queries scale
  * (pushdown, pruning, broadcast choice, codegen, no driver collects)
  * asserted on the actual optimized plans at sf0.001.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf0001)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q_agg_pricing: filter + column pruning reach the parquet scan") {
    val p = plan("q_agg_pricing")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"missing pushed filter in:\n$p")
    assert(p.contains("ReadSchema") && !p.contains("l_orderkey"),
      "scan should not read unused columns like l_orderkey")
  }

  test("q_nation_revenue: dimensions join as broadcast hash joins") {
    val p = plan("q_nation_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, s"expected >=2 BHJ in:\n$p")
  }

  test("q_top_orders: top-k plans as TakeOrderedAndProject, not a full sort") {
    assert(plan("q_top_orders").contains("TakeOrderedAndProject"))
  }

  test("q_bm25_search: postings filter pushed; vocab/meta broadcast") {
    val p = plan("q_bm25_search")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_dedup_embed: custom codegen dot-product expression in the plan") {
    val p = plan("q_dedup_embed")
    assert(p.toLowerCase.contains("floatvectordot"), s"custom expr missing in:\n$p")
  }

  test("q_dedup_embed: bucketed candidates, no all-pairs join") {
    // the 100 TB guarantee: candidates come from the sign-LSH bucket
    // equi-join, never a corpus x corpus cartesian/BNLJ
    val p = plan("q_dedup_embed")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join found in:\n$p")
  }

  test("q_bm25_store: term_bucket IN-list prunes store partitions at the scan") {
    // The gate entry itself (not just the library call): write the store,
    // query it, and require the driver-computed bucket literals to reach
    // the postings scan as PartitionFilters — the parquet analog of the
    // reference's Cassandra partition-key pushdown (app/query.py:43,50).
    val df = SparkEntry.queries("q_bm25_store")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [term_bucket"),
      s"expected term_bucket partition filter in:\n$p")
  }

  test("q_bm25_batch: per-query top-k on bounded heaps, no cartesian anywhere") {
    val df = SparkEntry.queries("q_bm25_batch")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"),
      s"batch serving must rank on the bounded-heap operator:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in batch serving:\n$p")
    // the only nested-loop is the bounded 1-row meta broadcast (count in
    // the FINAL plan section — the AQE string repeats the initial plan)
    val finalPlan = p.split("== Initial Plan ==").head
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(finalPlan).size
    assert(bnlj <= 1, s"unexpected nested loops ($bnlj) in:\n$finalPlan")
  }

  test("q_bm25_batch_store: the query log's bucket union prunes store partitions") {
    // batch serving keeps searchStore's pruning: the <= nBuckets bucket
    // IN-list (one tiny aggregate over the log, bounded driver metadata)
    // must reach the postings scan as PartitionFilters
    val df = SparkEntry.queries("q_bm25_batch_store")(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [term_bucket"),
      s"expected term_bucket partition filter in:\n$p")
  }

  test("q_phrase_store_delete: pruning survives the tombstone anti-join, which broadcasts") {
    // the delete-aware positional read must keep BOTH scale properties:
    // the bucket IN-list still reaches the scan as a PartitionFilter
    // (the anti-join applies after pruning), and the tombstone set joins
    // as a broadcast anti-join, never a sort-merge
    val df = SparkEntry.queries("q_phrase_store_delete")(spark, sf0001)
    df.collect() // AQE: join strategy only fixed in the executed plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [term_bucket"),
      s"expected term_bucket partition filter in:\n$p")
    assert(p.contains("LeftAnti") && p.contains("BroadcastHashJoin"),
      s"expected broadcast anti-join for tombstones in:\n$p")
    assert(!p.split('\n').exists(l => l.contains("SortMergeJoin") && l.contains("LeftAnti")),
      s"tombstone anti-join must not sort-merge in:\n$p")
  }

  test("q_bucketed_join: co-located SMJ with no join-side Exchange") {
    val df = SparkEntry.queries("q_bucketed_join")(spark, sf0001)
    df.collect() // finalize AQE
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
    // join inputs read the bucketed tables directly — any Exchange on the
    // JOIN KEY would mean the co-location failed (the groupBy above the
    // join legitimately exchanges on ITS key, o_orderpriority)
    assert(!p.contains("Exchange hashpartitioning(l_orderkey"),
      s"bucketed join still shuffles its inputs:\n$p")
    assert(p.contains("Bucketed: true"), s"scan not bucketed:\n$p")
  }

  test("window family data-path examples partition on high-cardinality keys") {
    // SCALE.md §Relational: q_window_ranks (partitioned by the 5-value
    // o_orderpriority) is the documented known-skew shape; every OTHER
    // window query on the gate must window over a high-cardinality key so
    // parallelism scales with the data, not the key domain.
    val highCard = Map(
      "q_window_topn"    -> "o_custkey",
      "q_window_running" -> "o_custkey",
      "q_window_ntile"   -> "o_custkey",
      "q_window_range"   -> "o_custkey",
      "q_window_lag"     -> "user_id",
      "q_topk_op"        -> "o_custkey",
      // low-cardinality stratum key, but on TopKPerKey that is the
      // point: partial heaps are map-side, the exchange carries <= k
      // rows per (stratum, task) — covered by the custom-op branch
      "q_reservoir"      -> "lang")
    highCard.foreach { case (q, key) =>
      // formatted mode: tree lines are bare operator names; the window's
      // partition spec lives in the details section (windowspecdefinition
      // for WindowExec, the Arguments line for the custom TopKPerKeyExec)
      val p = plan(q)
      val partitioned =
        p.contains(s"windowspecdefinition($key") ||
          (p.contains("TopKPerKey") && p.contains(s"hashpartitioning($key"))
      assert(partitioned, s"$q should partition its window by $key, got:\n$p")
      assert(!p.contains("windowspecdefinition(o_orderpriority"),
        s"$q must not window over the low-cardinality o_orderpriority")
    }
  }

  test("q_fuzzy_join: bigram blocking — equi-join only, no nested loop") {
    // the scale guarantee of the blocked fuzzy join: candidates come from
    // the bigram-block equi-join, never a dictionary x dictionary
    // BroadcastNestedLoopJoin / cartesian (O(D^2) levenshtein)
    val p = plan("q_fuzzy_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"nested-loop join found in:\n$p")
  }

  test("q_char_entropy: single-pass histogram expression, no translate chain") {
    val p = plan("q_char_entropy")
    assert(p.toLowerCase.contains("charhistogram"), s"custom expr missing in:\n$p")
    assert(!p.contains("translate("), s"translate re-scan chain still present:\n$p")
  }

  test("q_chunk: per-row generation fused into the scan — no shuffle") {
    val p = plan("q_chunk")
    assert(!p.contains("Exchange"), s"chunking must not shuffle:\n$p")
    assert(p.contains("Generate"), s"expected explode Generate in:\n$p")
  }

  test("q_funnel: user-keyed equi-joins only, no nested loop") {
    val p = plan("q_funnel")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"nested-loop join found in:\n$p")
  }

  test("q_prep_pipeline: four composed stages, no nested loop anywhere") {
    val p = plan("q_prep_pipeline")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"nested-loop join found in:\n$p")
    // the benchmark-side decontamination join must ride a broadcast
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
  }

  test("staged + incremental prep entries: equi-joins only, no nested loop") {
    // the staged twin's final plan is the reconstitution join + report
    // (boundaries already materialized by construction); the ingest
    // faces' (batch and streamed) are the survivor join + decontam
    // broadcast + report
    for (n <- Seq("q_prep_pipeline_staged", "q_prep_ingest",
        "q_stream_prep_ingest")) {
      val p = plan(n)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"nested-loop join found in $n:\n$p")
    }
  }

  test("q_prep_ann: probe-side nested loops are only the bounded centroid broadcasts") {
    // the dense prep twin's final plan is the pruned IVF probe; the only
    // cross shapes allowed are vectors × broadcast(≤16 centroids) — one
    // for the query assignment, one for candidate scoring's stored-side
    // reread — never a corpus × corpus pair
    val p = plan("q_prep_ann")
    assert(!p.contains("CartesianProduct"), s"cartesian product in:\n$p")
    // tree lines carry the join type; the (n) detail headers do not
    val treeLines = p.linesIterator
      .filter(l => l.contains("BroadcastNestedLoopJoin") && l.contains("Build"))
      .toSeq
    assert(treeLines.size <= 2,
      s"more nested loops than the centroid attaches in:\n$p")
    assert(treeLines.forall(_.contains("Cross BuildRight")),
      s"non-broadcast-bounded nested loop in:\n$p")
  }

  test("q_store_fsck_incr: the audit watermark reaches the store scans as a pushed filter") {
    // the incremental audit's scale contract: `batch > since` must land
    // in PushedFilters so parquet min/max statistics (batch is constant
    // per file) skip every pre-audit file before row IO — without the
    // pushdown the "incremental" audit silently re-reads the store
    val p = plan("q_store_fsck_incr")
    assert(p.contains("GreaterThan(batch,"),
      s"batch watermark not pushed to the scan in:\n$p")
  }

  test("q_profile: exact distinct branches plan without an Expand") {
    val p = plan("q_profile")
    assert(!p.contains("Expand"), s"Expand found in exact profile plan:\n$p")
  }

  test("q_corr_matrix: one scan, one Expand-free aggregate for all pairs") {
    val p = plan("q_corr_matrix")
    assert(!p.contains("Expand"), s"Expand found in co-moment plan:\n$p")
    // formatted output lists each node twice (tree + detail) — count ids
    val scanIds = """\((\d+)\) Scan parquet""".r.findAllMatchIn(p)
      .map(_.group(1)).toSet
    assert(scanIds.size === 1,
      s"all C(k,2) pairs must come from ONE lineitem pass:\n$p")
  }

  test("q_bloom_join: bloom probe on the scan side, then a real semi join") {
    val p = plan("q_bloom_join")
    // the probe is pure column arithmetic over the broadcast bitset —
    // shift/AND must appear below the semi join, not a UDF
    assert(p.contains("shiftrightunsigned"), s"bloom probe missing in:\n$p")
    assert(p.contains("LeftSemi"), s"exact semi join missing in:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian found in:\n$p")
  }

  test("q_hybrid_rrf: fusion adds no corpus-side nested loop") {
    val p = plan("q_hybrid_rrf")
    assert(!p.contains("CartesianProduct"), s"cartesian found in:\n$p")
    assert(p.contains("TopKPerKey"), s"bounded-heap ranking missing in:\n$p")
  }

  test("q_zorder: 1-row stats ride a broadcast, never a shuffled cartesian") {
    // the min/max normalization stats must attach as a broadcast nested
    // loop over ONE row — a CartesianProduct would shuffle the fact side
    val p = plan("q_zorder")
    assert(p.contains("BroadcastNestedLoopJoin"), s"stats not broadcast in:\n$p")
    assert(!p.contains("CartesianProduct"), s"shuffled cartesian in:\n$p")
  }

  test("q_bpe pair counting aggregates two-phase over the vocabulary") {
    // the per-iteration pair count must be partial+final (map-side
    // combine) so the exchange carries pair cardinality, not vocab rows
    import org.apache.spark.sql.functions.col
    val words = graft.text.Bpe.wordCounts(
      Tables.load(spark, sf0001, "documents"))
      .withColumn("repr", graft.text.Bpe.charRepr(col("word")))
    val p = graft.text.Bpe.pairCounts(words)
      .queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final HashAggregate in:\n$p")
  }

  test("q_phrase_search: doc_id equi-joins only; top-k via bounded heaps") {
    val p = plan("q_phrase_search")
    assert(!p.contains("CartesianProduct"), s"cartesian found in:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"full sort instead of top-k in:\n$p")
  }

  test("q_cooccur_pmi: pair generation is an equi-join, never a range/nested loop") {
    val p = plan("q_cooccur_pmi")
    assert(!p.contains("CartesianProduct"), s"cartesian found in:\n$p")
    // the (doc_id, pos) pair join must be a hash/merge equi-join; the only
    // nested loop allowed is the 1-row totals broadcast (q_zorder pattern)
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)".r.findFirstIn(p).isDefined,
      s"equi-join for pair generation missing in:\n$p")
    // two 1-row nested loops are legitimate: T×P (1-row × 1-row) and the
    // totals attach onto the pair frame; anything more would mean the
    // pair generation itself degenerated
    val bnlj = "\\+- BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 2, s"more nested loops than the 1-row attaches in:\n$p")
  }

  test("q_equidepth: no global sort, no single-partition window") {
    val p = plan("q_equidepth")
    assert(!p.contains("windowspecdefinition"), s"window found in:\n$p")
    assert(!p.contains("Exchange rangepartitioning"), s"global sort found in:\n$p")
  }

  test("q_feature_hash: hash projection fused into the scan, one exchange") {
    val p = plan("q_feature_hash")
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
      s"expected at most the aggregate exchange in:\n$p")
  }

  test("span/chunk dedup queries: hash equi-joins only, no all-pairs path") {
    Seq("q_dup_spans", "q_span_clean", "q_chunk_dedup").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q: all-pairs join in:\n$p")
    }
  }

  test("q_temperature_mix: per-stratum factors ride a broadcast back to the data") {
    val p = plan("q_temperature_mix")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast factor join in:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"stratum factors must never shuffle the corpus side:\n$p")
  }

  test("aggregation queries use two-phase (partial) hash aggregation") {
    val p = plan("q_agg_pricing")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "expected partial+final HashAggregate")
  }

  test("whole-stage codegen covers the scan->aggregate pipeline") {
    // AQE shows codegen stages only in the final (post-execution) plan —
    // and only for the executed QueryExecution itself (collect, not
    // count, which plans a separate aggregate on top).
    val df = SparkEntry.queries("q_filter_in")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1)") || p.contains("WholeStageCodegen"),
      s"no codegen spans in final plan:\n$p")
  }

  test("AQE skew-join split fires on a hot-key sort-merge join") {
    // SCALE.md's skew posture has two halves: manual salting for the
    // shapes AQE can't fix (Skew.saltedJoin/saltedCount, oracle-verified)
    // and AQE's runtime skew-split for plain shuffled joins. This pins
    // the second half: a 90%-hot-key join, broadcast disabled, thresholds
    // scaled to fixture bytes — the executed SMJ must carry the
    // skew=true marker (AQE split the hot partition into subpartitions).
    import org.apache.spark.sql.functions.{lit, when}
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      val left = spark.range(0, 200000).select(
        when(org.apache.spark.sql.functions.col("id") % 10 === 0,
          org.apache.spark.sql.functions.col("id") % 1000)
          .otherwise(lit(7L)).as("k"),
        org.apache.spark.sql.functions.col("id").as("v"))
      val right = spark.range(0, 1000)
        .select(org.apache.spark.sql.functions.col("id").as("k"),
          lit("x").as("tag"))
      val joined = left.join(right, "k")
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE did not mark the hot-key SMJ as skew-split:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
