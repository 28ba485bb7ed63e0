package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.analyzer.Analyzer

/** Feature hashing (the "hashing trick"): project an unbounded token
  * vocabulary onto a fixed `nBuckets`-dimensional space by hashing each
  * token to its bucket. The standard vectorizer for linear/quality
  * models over web-scale corpora — no vocabulary dictionary to build,
  * broadcast, or keep consistent across runs: the hash IS the feature
  * id, so a 100 TB corpus and a 1-row probe featurize identically with
  * zero shared state.
  *
  * The hash is the repo's portable salted-md5 family
  * ([[Sampling.saltedHash]]) — any engine reproduces bucket ids
  * bit-for-bit, which keeps the featurization hash-verifiable.
  *
  * Scale: tokenize → hash is a narrow per-row projection fused into the
  * scan; the only exchange is the `(doc_id, bucket)` count — strictly
  * smaller than a `(doc_id, term)` aggregation since buckets collide.
  */
object Features {

  /** Sparse hashed term-frequency features:
    * `(doc_id, bucket, tf)` — bucket ∈ [0, nBuckets). */
  def hashedTf(corpus: DataFrame, nBuckets: Int = 1024,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    corpus
      .select(col(idCol).as("doc_id"),
        explode(Analyzer.tokens(col(textCol))).as("term"))
      .select(col("doc_id"),
        pmod(Sampling.saltedHash("feat", col("term")), lit(nBuckets.toLong)).as("bucket"))
      .groupBy("doc_id", "bucket")
      .agg(count(lit(1)).as("tf"))
  }
}
