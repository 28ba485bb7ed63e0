package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning: build a compact bitset over the selective
  * (dim) side's join keys, broadcast it, and drop fact rows that cannot
  * match BEFORE the join's exchange — the classic pattern for a huge
  * fact ⋈ selective dim where the dim keyset is too large for an
  * IN-list literal yet its Bloom summary (kilobytes–megabytes) still
  * broadcasts. Spark's optimizer has an automatic variant (runtime
  * bloom-filter join pruning); this operator makes the same idea an
  * explicit, tunable building block that works on any plan shape and
  * any key expression.
  *
  * Semantics are transparent: a Bloom filter has no false negatives,
  * and the exact join that follows kills the false positives — so the
  * result is definitionally the plain semi join (which is exactly what
  * the oracle checks). What changes is the physics: at 100 TB, rows
  * eliminated map-side never enter the shuffle, and the exchange volume
  * drops from |fact| to |fact ∩ dim| + ε·|fact| (ε = false-positive
  * rate ≈ (1 - e^(-hn/m))^h).
  *
  * Both sides hash with `xxhash64` over the key columns; bit positions
  * derive from that 64-bit value by double hashing (h_i = h1 + i·h2,
  * Kirsch–Mitzenmacher), so build and probe agree by construction. The
  * aggregate is mergeable (bitwise OR) — Spark runs it partial+final
  * with bounded `m/8`-byte state per partition, never a collect.
  */
object BloomJoin {

  /** Mergeable Bloom bitset over pre-hashed 64-bit keys. */
  class BloomAgg(numBits: Int, numHashes: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(numBits > 0 && numBits % 64 == 0, s"numBits must be a positive multiple of 64, got $numBits")
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
    def zero: Array[Long] = new Array[Long](numBits / 64)
    def reduce(b: Array[Long], x: Long): Array[Long] = {
      val h2 = (x >>> 33) | 1L
      var i = 0
      while (i < numHashes) {
        val pos = java.lang.Math.floorMod(x + i * h2, numBits.toLong).toInt
        b(pos >>> 6) |= 1L << (pos & 63)
        i += 1
      }
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** One-row DataFrame holding the Bloom bitset (`array<long>`, column
    * `bloom_bits`) of `dim`'s key columns. */
  def buildBloom(dim: DataFrame, keyCols: Seq[String],
                 numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame =
    dim.select(xxhash64(keyCols.map(col): _*).as("__xx"))
      .agg(udaf(new BloomAgg(numBits, numHashes), Encoders.scalaLong)
        .apply(col("__xx")).as("bloom_bits"))

  /** Probe-side membership test — pure column arithmetic (pmod / shift /
    * AND over the broadcast bitset), fully inside whole-stage codegen.
    * `xx` must be `xxhash64` over columns type-identical to the build's.
    */
  def mightContain(bloom: Column, xx: Column,
                   numBits: Int = 1 << 20, numHashes: Int = 5): Column = {
    val h2 = call_function("shiftrightunsigned", xx, lit(33)).bitwiseOR(lit(1L))
    (0 until numHashes).map { i =>
      val pos = pmod(xx + lit(i.toLong) * h2, lit(numBits.toLong))
      // pos < 2^31 → exact in double; element_at is 1-based
      val word = element_at(bloom, floor(pos / lit(64)).cast("int") + lit(1))
      call_function("shiftrightunsigned", word, (pos % 64).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** Fact rows whose key survives the dim-side Bloom — a superset of the
    * true semi join (no false negatives), computed without shuffling the
    * fact. `on` pairs (factCol, dimCol); types must match pairwise for
    * the shared hash. */
  def bloomPruned(fact: DataFrame, dim: DataFrame, on: Seq[(String, String)],
                  numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame = {
    require(on.nonEmpty, "bloomPruned needs at least one key pair")
    val bloom = buildBloom(dim, on.map(_._2), numBits, numHashes)
    fact.crossJoin(broadcast(bloom))
      .filter(mightContain(col("bloom_bits"),
        xxhash64(on.map(p => col(p._1)): _*), numBits, numHashes))
      .drop("bloom_bits")
  }

  /** The full pruned semi join: Bloom pre-filter, then the exact semi
    * join on the (deduplicated, hence safely re-usable) dim keys — same
    * answer as `fact SEMI JOIN dim`, with the fact-side exchange carrying
    * only Bloom survivors. */
  def prunedSemiJoin(fact: DataFrame, dim: DataFrame, on: Seq[(String, String)],
                     numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame = {
    val pruned = bloomPruned(fact, dim, on, numBits, numHashes)
    val cond = on.map { case (f, d) => pruned(f) === dim(d) }.reduce(_ && _)
    pruned.join(dim.select(on.map(p => col(p._2)): _*).distinct(), cond, "left_semi")
  }
}
