package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.pipeline.Sampling

/** Portable count-min sketch: `d` hash rows × `w` buckets of additive
  * counters — the frequency-estimation member of the sketch family
  * (KMV = distinct count, HLL = engine-native distinct, CMS = per-item
  * frequency). Every bucket index derives from the md5-based portable
  * hash, so the DuckDB oracle rebuilds the sketch counter-for-counter
  * and the estimates are hash-verifiable, not just plausible.
  *
  * Scale: the sketch is `d·w` longs of additive state — partial
  * aggregation combines map-side, sketches of disjoint batches MERGE by
  * adding counters (the same mergeable-state argument as
  * [[graft.pipeline.IncrementalAgg]] — a CMS over an append-only stream
  * is maintained incrementally for free), and the memory bound is
  * independent of item cardinality: estimate error ≤ 2N/w with
  * probability 1 − (1/2)^d, never an under-count.
  */
object CountMinSketch {

  /** Bucket of `item` in hash row `row` (domain-separated salts). */
  def bucket(row: Int, item: Column, w: Int): Column =
    pmod(Sampling.saltedHash(s"cms$row", item), lit(w.toLong))

  /** Build the `(row, bucket, c)` counter table over one occurrence per
    * input row of `itemCol`. */
  def build(items: DataFrame, itemCol: String, d: Int, w: Int): DataFrame =
    items
      .select(explode(array((0 until d).map(j =>
        struct(lit(j).as("row"), bucket(j, col(itemCol), w).as("bucket"))): _*)).as("rb"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Point estimates for every distinct item: min over the `d` counters
    * the item hashes into. The sketch (≤ d·w rows) broadcasts. */
  def estimate(items: DataFrame, itemCol: String, d: Int, w: Int): DataFrame = {
    val sketch = build(items, itemCol, d, w)
    items.select(col(itemCol).as("item")).distinct()
      .select(col("item"), explode(array((0 until d).map(j =>
        struct(lit(j).as("row"), bucket(j, col("item"), w).as("bucket"))): _*)).as("rb"))
      .select(col("item"), col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("row", "bucket"))
      .groupBy("item")
      .agg(min(col("c")).as("est"))
  }
}
