// Merge-vs-rebuild A/B — the SCALE.md evidence for the r13 shard
// merges: starting from two built shards (the parallel-build state a
// 100 TB pipeline is already in), compare promoting them into one
// serving store via StoreMerge.mergeStores (copy mode, then move mode
// on the same shard pair — copy runs first, it leaves sources intact)
// against a full writeIndex rebuild over the union. Also the IVF twin.
// Prints MERGEAB lines; extract with `grep -o 'MERGEAB .*'` (progress
// bars glue \r onto line starts).
// Usage:
//   SF_DIR=/root/testdata/sf0.1 /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --driver-class-path target/scala-2.13/classes -I tools/merge_ab.scala <<< 'sys.exit(0)'
import org.apache.spark.sql.functions._
import graft.index.{Indexer, StoreMerge}
import graft.similarity.IvfStore

spark.sparkContext.setLogLevel("ERROR")
val dir = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.1")
val docs = spark.read.parquet(s"$dir/documents.parquet")
val emb = spark.read.parquet(s"$dir/embeddings.parquet")
val base = java.nio.file.Files.createTempDirectory("mergeab").toString

def t(f: => Unit): Double = { val s = System.nanoTime; f; (System.nanoTime - s) / 1e9 }

// the shard builds are the STARTING STATE of both alternatives, not
// part of either side of the A/B — printed for context only
val shardSecs = t {
  Indexer.writeIndex(Indexer.buildIndex(docs.filter(col("doc_id") % 2 === 0)), s"$base/shardA")
  Indexer.writeIndex(Indexer.buildIndex(docs.filter(col("doc_id") % 2 === 1)), s"$base/shardB")
}
val mCopy = t { StoreMerge.mergeStores(spark,
  Seq(s"$base/shardA", s"$base/shardB"), s"$base/mergedCopy") }
val mMove = t { StoreMerge.mergeStores(spark,
  Seq(s"$base/shardA", s"$base/shardB"), s"$base/mergedMove", moveFiles = true) }
val rebuild = t { Indexer.writeIndex(Indexer.buildIndex(docs), s"$base/full") }
println(f"MERGEAB family=index shard_builds=$shardSecs%.2f merge_copy=$mCopy%.2f merge_move=$mMove%.2f rebuild=$rebuild%.2f")

// correctness spot-check: the promoted store answers like the rebuild.
// Compare ROUNDED (doc_id, score) sets — raw-score ordering can flip on
// sub-ulp summation noise between two value-identical stores (the gate
// oracle rounds for the same reason); value-for-value equality is the
// gate's job (q_store_merge), this guards the probe itself
// NOTE single line: spark-shell -I evaluates a continuation .method on
// the next line as a NEW expression (the def would return the DataFrame
// and the comparison would test reference equality)
def top(path: String) = graft.search.BM25.searchStore(spark, path, "fast hash join scan").select(col("doc_id"), round(col("score"), 4).as("s")).collect.map(r => (r.getLong(0), r.getDouble(1))).toSet
println(s"MERGEAB family=index answers_match=${top(s"$base/mergedMove") == top(s"$base/full")}")

val ivfShardSecs = t {
  IvfStore.writeIndex(emb.filter(col("vec_id") % 2 === 0), s"$base/ivfA", kmeansIters = 0)
  IvfStore.writeIndex(emb.filter(col("vec_id") % 2 === 1), s"$base/ivfB", kmeansIters = 0)
}
val ivfCopy = t { IvfStore.mergeStores(spark,
  Seq(s"$base/ivfA", s"$base/ivfB"), s"$base/ivfMergedCopy") }
val ivfMove = t { IvfStore.mergeStores(spark,
  Seq(s"$base/ivfA", s"$base/ivfB"), s"$base/ivfMergedMove", moveFiles = true) }
val ivfRebuild = t { IvfStore.writeIndex(emb, s"$base/ivfFull", kmeansIters = 0) }
println(f"MERGEAB family=ivf shard_builds=$ivfShardSecs%.2f merge_copy=$ivfCopy%.2f merge_move=$ivfMove%.2f rebuild=$ivfRebuild%.2f")
