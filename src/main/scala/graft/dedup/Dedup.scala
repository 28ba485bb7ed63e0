package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analyzer.Analyzer

/** Document deduplication for large-scale training-data pipelines: exact,
  * n-gram-Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup.
  * All pure DataFrame/column code — no UDFs, no driver-side loops.
  *
  * Scale design (100 TB corpus):
  *   - [[exactDuplicates]] shuffles a 128-bit digest, never the text.
  *   - [[jaccardPairs]] (exact) self-joins on shingle — correct but the
  *     candidate count grows with shingle collision rates; common-shingle
  *     skew is capped by [[shingleDfCap]] (drop shingles appearing in
  *     more than `maxDf` docs — they generate O(df²) candidates and
  *     contribute only to pairs that share rarer shingles too).
  *   - [[minhashLshPairs]] is the scale path: O(docs × bands) rows into
  *     the bucket join instead of O(docs × shingles); with 128 perms in
  *     32 bands of 4, a pair at Jaccard 0.5 is caught with p ≈ 1-(1-0.5⁴)³² ≈ 0.87,
  *     at 0.8 with p ≈ 1-(1-0.41)³² ≈ 1-5e-8. Candidates are then
  *     exact-verified, so precision is exact; recall is the LSH curve.
  *   - [[simhashPairs]] uses the 4×16-bit band pigeonhole: any pair with
  *     Hamming distance ≤ 3 shares at least one of 4 bands — the banded
  *     join is exact for maxHamming ≤ 3.
  */
object Dedup {

  /** Exact duplicate groups by content digest: `(text_md5, keep_id,
    * n_copies)`; `keep_id` = min doc id (deterministic survivor policy).
    * Only the digest and id shuffle.
    */
  def exactDuplicates(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    df.select(md5(col(textCol)).as("text_md5"), col(idCol).as("id"))
      .groupBy("text_md5")
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct word n-gram shingles per document: `(doc_id, shingle)`.
    * Shingling is array-level (`transform` over token positions) — no
    * positional self-join, no UDF.
    */
  def shingles(df: DataFrame, idCol: String = "doc_id", textCol: String = "text",
               n: Int = 3): DataFrame = {
    val toks = Analyzer.tokens(col(textCol))
    // filter first: sequence(0, size-n) is only valid once size >= n
    // (sequence(0, -1) would yield a DESCENDING [0, -1], not empty).
    df.filter(size(toks) >= n)
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(
          transform(
            sequence(lit(0), size(toks) - n),
            i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k + 1)): _*))))
          .as("shingle"))
  }

  /** Drop shingles occurring in more than `maxDf` documents (stop-shingle
    * skew cap for the exact self-join path). */
  def shingleDfCap(sh: DataFrame, maxDf: Long): DataFrame = {
    val df = sh.groupBy("shingle").agg(count(lit(1)).as("sdf"))
    sh.join(broadcast(df.filter(col("sdf") > maxDf)), Seq("shingle"), "left_anti")
  }

  /** Exact Jaccard near-dup pairs ≥ `minJaccard` over shingle sets:
    * `(doc_a, doc_b, jaccard)`, doc_a < doc_b.
    * Any pair with Jaccard > 0 shares ≥ 1 shingle, so the shingle
    * self-join enumerates exactly the candidates with nonzero overlap.
    */
  def jaccardPairs(sh: DataFrame, minJaccard: Double): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val a = sh.toDF("doc_a", "shingle")
    val b = sh.toDF("doc_b", "shingle")
    val inter = a.join(b, "shingle")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.toDF("doc_a", "na"), "doc_a")
      .join(sizes.toDF("doc_b", "nb"), "doc_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("na") + col("nb") - col("n_inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** MinHash signatures: `(doc_id, h0..h{k-1})` where
    * `h_i = min over shingles of xxhash64(i, shingle)`.
    * One narrow aggregation; k min-columns ride the same shuffle.
    */
  def minhashSignatures(sh: DataFrame, numHashes: Int = 128): DataFrame =
    sh.groupBy("doc_id").agg(
      min(xxhash64(lit(0), col("shingle"))).as("h0"),
      (1 until numHashes).map(i =>
        min(xxhash64(lit(i), col("shingle"))).as(s"h$i")): _*)

  /** LSH banding: `(doc_id, band, bucket)` — `bands` rows per doc, bucket =
    * hash of the band's `rowsPerBand` signature slots. */
  def lshBuckets(sig: DataFrame, numHashes: Int = 128, bands: Int = 32): DataFrame = {
    val rowsPerBand = numHashes / bands
    val bandStructs = array((0 until bands).map { bnd =>
      val slots = (0 until rowsPerBand).map(r => col(s"h${bnd * rowsPerBand + r}"))
      struct(lit(bnd).as("band"), xxhash64(lit(bnd) +: slots: _*).as("bucket"))
    }: _*)
    sig.select(col("doc_id"), explode(bandStructs).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
  }

  /** MinHash+LSH near-dup pairs, exact-verified: candidates from the
    * band-bucket join, then true Jaccard computed on the shingle sets and
    * filtered at `minJaccard`. Output identical in shape (and, at
    * practical recall, in content) to [[jaccardPairs]].
    */
  def minhashLshPairs(sh: DataFrame, minJaccard: Double,
                      numHashes: Int = 128, bands: Int = 32): DataFrame = {
    val buckets = lshBuckets(minhashSignatures(sh, numHashes), numHashes, bands)
    val cand = buckets.toDF("doc_a", "band", "bucket")
      .join(buckets.toDF("doc_b", "band", "bucket"), Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
    val sets = sh.groupBy("doc_id").agg(collect_set(col("shingle")).as("sh_set"))
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("sh_set").as("set_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh_set").as("set_b")), "doc_b")
      .withColumn("n_inter", size(array_intersect(col("set_a"), col("set_b"))))
      .withColumn("jaccard", col("n_inter").cast("double") /
        (size(col("set_a")) + size(col("set_b")) - col("n_inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** 64-bit SimHash per document: for each bit j, sum tf-weighted ±1 over
    * `xxhash64(term)`'s bit j, then collect sign bits. 64 sum-aggregates
    * in one shuffle on doc_id.
    */
  def simhash64(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tokens = df.select(col(idCol).as("doc_id"),
      explode(Analyzer.tokens(col(textCol))).as("term"))
    val h = xxhash64(col("term"))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L))).as(s"b$j")
    }
    val assembled = (0 until 64).map { j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    tokens.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), assembled.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ `maxHamming` (≤ 3 for
    * exactness with 4 bands — pigeonhole over 4×16-bit chunks). */
  def simhashPairs(sim: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-band pigeonhole is exact only for maxHamming <= 3")
    val banded = sim.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map { k =>
        struct(lit(k).as("band"),
          shiftright(col("simhash"), 16 * k).bitwiseAND(lit(0xFFFFL)).as("chunk"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.band"), col("bb.chunk"))
    banded.toDF("doc_a", "sim_a", "band", "chunk")
      .join(banded.toDF("doc_b", "sim_b", "band", "chunk"), Seq("band", "chunk"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-dup pairs ≥ `minCos`: `(id_a, id_b, cos)`.
    * Brute-force all-pairs via block-nested-loop; at scale, pre-bucket
    * with [[graft.similarity.Similarity.signBuckets]] and join on bucket
    * instead (see q_ann_lsh).
    */
  def embeddingNearDupPairs(emb: DataFrame, minCos: Double,
                            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", graft.similarity.Similarity.cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= minCos)
      .select("id_a", "id_b", "cos")
  }
}
