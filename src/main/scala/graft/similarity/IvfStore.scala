package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index — the ANN analog of the BM25 index store: build
  * once, store as parquet, answer queries from the store with partition
  * pruning on the probed centroid lists.
  *
  * Layout:
  *   - `centroids` — `(cid, cvec)`: ≤ nCentroids rows, broadcast at query
  *     time;
  *   - `lists`     — corpus vectors with precomputed norms, PARTITIONED BY
  *     `cid`: a query reading `nProbe` of `nCentroids` lists scans
  *     ~nProbe/nCentroids of the corpus (the parquet analog of an IVF
  *     index's inverted lists).
  *
  * Query-time pruning mirrors the BM25 store's term buckets: the probed
  * cids for a bounded query set are collected driver-side (≤ nCentroids
  * ints — metadata, not data) and pushed as an IN-list partition filter,
  * so untouched lists are never opened.
  */
object IvfStore {

  def writeIndex(corpus: DataFrame, path: String,
                 nCentroids: Int = 16, kmeansIters: Int = 2,
                 idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = corpus.sparkSession
    Similarity.kmeansCentroids(corpus, nCentroids, kmeansIters, idCol, vecCol)
      .write.mode("overwrite").parquet(s"$path/centroids")
    // assign against the JUST-PERSISTED centroids (derive-from-persisted
    // rule — and the exact same centroid values the query path will read)
    val cents = broadcast(spark.read.parquet(s"$path/centroids"))
    Similarity.assignToCentroids(
        corpus.select(col(idCol).as("vec_id"), col(vecCol).as("v")),
        cents, "vec_id", "v", keep = 1)
      .withColumn("nv", Similarity.norm(col("v")))
      .repartition(col("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(s"$path/lists")
  }

  def searchStore(spark: SparkSession, path: String, queries: DataFrame, k: Int,
                  nProbe: Int = 4,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = broadcast(spark.read.parquet(s"$path/centroids"))
    val q = Similarity.assignToCentroids(
        queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
        cents, "query_id", "qv", keep = nProbe)
      .withColumn("nq", Similarity.norm(col("qv")))
    // probed cids: bounded by nCentroids — a driver-side IN-list literal
    // is what turns into a static PartitionFilter on the lists scan
    val probed = q.select("cid").distinct().collect().map(_.getInt(0)).toSeq
    val lists = spark.read.parquet(s"$path/lists")
      .filter(col("cid").isin(probed: _*))
    Similarity.probeRank(lists, q, k)
  }
}
