package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the last step of a training-data pipeline: documents
  * are concatenated (in a deterministic order) and chopped into fixed
  * `seqLen`-token training sequences ("concat-then-chunk"). Each document
  * is assigned the pack its FIRST token lands in, so the assignment is a
  * pure function of the corpus — no RNG, no partitioning dependence —
  * and the whole layout is reproducible run-over-run and engine-portable
  * (the DuckDB oracle recomputes it exactly).
  *
  * Layout: docs are sharded by a salted portable hash of the id
  * ([[Sampling.saltedHash]]), ordered within a shard by that same hash
  * (id tiebreak), and the running token offset determines the pack:
  * `pack_id = floor(offset / seqLen)`.
  *
  * Scale: one hash-partitioned sort per shard — the window partitions on
  * `shard` (cardinality `nShards`, a knob), so per-partition state is
  * `corpus_tokens / nShards`, independent of cluster size. At 100 TB you
  * raise `nShards` so a shard's token stream fits a task (e.g. 2^14
  * shards ≈ 6 GB/shard at 100 TB); packing never needs a global sort.
  */
object Packing {

  /** Per-document pack assignment: adds `shard`, `offset` (tokens before
    * this doc within its shard) and `pack_id`. `tokCol` must already hold
    * the document's token count. */
  def packAssignments(df: DataFrame, idCol: String, tokCol: String,
                      nShards: Int, seqLen: Int,
                      salt: String = "pack"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    // `shard`/`offset`/`pack_id` are the documented output columns and
    // `__h` is scratch — refuse inputs that already carry any of them
    // rather than silently overwriting caller data.
    val reserved = Seq("__h", "shard", "offset", "pack_id")
    val clash = df.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"input already has column(s) ${clash.mkString(", ")} — " +
        s"reserved as packAssignments output/scratch names")
    val h = Sampling.saltedHash(salt, col(idCol))
    val w = Window.partitionBy("shard").orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)).cast("int"))
      .withColumn("offset", coalesce(sum(col(tokCol)).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"offset div $seqLen"))
      .drop("__h")
  }

  /** Pack-level report: docs and tokens landing in each (shard, pack) —
    * the shape a sequence-writer consumes and the fill/fragmentation
    * signal an operator watches. */
  def packReport(df: DataFrame, idCol: String, tokCol: String,
                 nShards: Int, seqLen: Int,
                 salt: String = "pack"): DataFrame =
    packAssignments(df, idCol, tokCol, nShards, seqLen, salt)
      .groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum(col(tokCol)).as("n_tokens"))
}
