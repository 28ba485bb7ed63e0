package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.pipeline.PrepPipeline

/** Unit-level twin of the q_prep_pipeline / q_prep_pipeline_staged gate
  * pair: the staged lineage materializes every boundary on disk and each
  * stage frame holds EXACTLY the unstaged stage's doc_id set. */
class PrepPipelineSpec extends SparkSpec {

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet

  test("stageTo materializes each boundary; staged stage frames == unstaged") {
    val d = Tables.load(spark, sf0001, "documents")
    val unstaged = PrepPipeline.stages(d, 0.5)
    val dir = Files.createTempDirectory("prepstage").toString
    val staged = PrepPipeline.stages(d, 0.5, PrepPipeline.stageTo(dir, d))
    val faces = Seq(
      ("1_quality", unstaged.quality, staged.quality),
      ("2_dedup", unstaged.deduped, staged.deduped),
      ("3_decontam", unstaged.clean, staged.clean))
    for ((name, un, st) <- faces) {
      assert(new java.io.File(s"$dir/$name").exists(), s"boundary $name not materialized")
      val (a, b) = (ids(un), ids(st))
      assert(a === b, s"stage $name: staged ids diverge from unstaged")
      // the boundary table itself carries the same population (narrow ids)
      assert(ids(spark.read.parquet(s"$dir/$name")) === a, s"boundary table $name")
    }
    // monotone attrition, ending non-empty on the fixture
    assert(ids(staged.clean).nonEmpty)
    assert(ids(staged.clean).subsetOf(ids(staged.deduped)))
    assert(ids(staged.deduped).subsetOf(ids(staged.quality)))
    // staged frames keep the corpus' full column surface
    assert(staged.clean.columns.sorted.toSeq === d.columns.sorted.toSeq)
  }
}
