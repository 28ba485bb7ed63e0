package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Benchmark decontamination: find training documents that share n-gram
  * shingles with an evaluation/benchmark set — the step that keeps test
  * data out of a training corpus.
  *
  * Scale design (100 TB corpus, MB-scale benchmark): the benchmark side
  * is tiny by construction, so its shingle set BROADCASTS — the corpus
  * shingle stream joins map-side with no shuffle of corpus data; only the
  * (train_id, bench_id) hits (a vanishingly small fraction) reach the
  * pair-count aggregation. minShared > 1 suppresses single-collision
  * noise from common phrases.
  */
object Contamination {

  /** `(train_id, bench_id, n_shared)` for every training doc sharing at
    * least `minShared` distinct `n`-gram shingles with a benchmark doc. */
  def contaminatedPairs(train: DataFrame, bench: DataFrame,
                        idCol: String = "doc_id", textCol: String = "text",
                        n: Int = 3, minShared: Long = 1L): DataFrame = {
    val shT = Dedup.shingles(train, idCol, textCol, n)
      .select(col("doc_id").as("train_id"), col("shingle"))
    val shB = Dedup.shingles(bench, idCol, textCol, n)
      .select(col("doc_id").as("bench_id"), col("shingle"))
    shT.join(broadcast(shB), "shingle")
      .groupBy("train_id", "bench_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** The clean corpus: training docs with NO benchmark contamination at
    * the (n, minShared) level — the left-anti face of the report. */
  def decontaminate(train: DataFrame, bench: DataFrame,
                    idCol: String = "doc_id", textCol: String = "text",
                    n: Int = 3, minShared: Long = 1L): DataFrame =
    train.join(
      contaminatedPairs(train, bench, idCol, textCol, n, minShared)
        .select(col("train_id").as(idCol)).distinct(),
      Seq(idCol), "left_anti")
}
