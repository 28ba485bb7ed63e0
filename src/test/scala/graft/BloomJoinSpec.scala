package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomJoin

/** Bloom-filter join pruning ([[graft.operators.BloomJoin]]): the
  * pre-filter must be a strict superset of the true semi join (no false
  * negatives — the correctness half) that actually prunes (the physics
  * half), and the full pruned semi join must equal the plain semi join
  * row for row. */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fact = spark.read
    .parquet(s"$sf0001/lineitem.parquet").select("l_orderkey", "l_returnflag")
  private lazy val dim = spark.read
    .parquet(s"$sf0001/orders.parquet")
    .filter(col("o_orderpriority") === "1-URGENT")
    .select("o_orderkey")

  test("bloomPruned: superset of true matches, and actually prunes") {
    val pruned = BloomJoin.bloomPruned(fact, dim,
      Seq("l_orderkey" -> "o_orderkey"), numBits = 1 << 14)
    val trueKeys = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"),
      "left_semi")
    // no false negatives: every true match survives the bloom
    assert(trueKeys.exceptAll(pruned).isEmpty, "bloom dropped a true match")
    // the filter is not a no-op: survivors are well under the fact size
    val (total, kept, truth) = (fact.count(), pruned.count(), trueKeys.count())
    assert(kept < total, s"bloom pruned nothing ($kept of $total)")
    assert(kept >= truth)
    // with 16K bits over this dim the false-positive tail is small
    assert(kept <= truth + (total - truth) / 2,
      s"false-positive rate too high: kept=$kept truth=$truth total=$total")
  }

  test("prunedSemiJoin equals the plain semi join exactly") {
    val viaBloom = BloomJoin.prunedSemiJoin(fact, dim,
      Seq("l_orderkey" -> "o_orderkey"), numBits = 1 << 14)
    val plain = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"),
      "left_semi")
    assert(viaBloom.exceptAll(plain).isEmpty && plain.exceptAll(viaBloom).isEmpty)
  }

  test("bloom aggregate merges across partitions deterministically") {
    val keys = (1L to 1000L).toDF("k")
    val one = BloomJoin.buildBloom(keys.coalesce(1), Seq("k"), numBits = 1 << 12)
      .head().getSeq[Long](0)
    val many = BloomJoin.buildBloom(keys.repartition(7), Seq("k"), numBits = 1 << 12)
      .head().getSeq[Long](0)
    assert(one === many, "bitset must not depend on partitioning")
  }

  test("mightContain never rejects an inserted key") {
    val keys = (1L to 500L).toDF("k")
    val bloom = BloomJoin.buildBloom(keys, Seq("k"), numBits = 1 << 12)
    val misses = keys.crossJoin(broadcast(bloom))
      .filter(!BloomJoin.mightContain(col("bloom_bits"), xxhash64(col("k")),
        numBits = 1 << 12))
    assert(misses.isEmpty)
  }
}
