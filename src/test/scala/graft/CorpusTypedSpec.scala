package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.corpus.Corpus
import graft.operators.TypedAggregators

class CorpusTypedSpec extends SparkSpec {
  import spark.implicits._

  private lazy val raw = Seq(
    (3L, "Title C!", "Some TEXT, with Punct."),
    (1L, "A\tTabbed\nTitle", "hello   WORLD"),
    (2L, "B", "")
  ).toDF("doc_id", "title", "text")

  test("prepare: project + clean + deterministic limit (E1)") {
    val all = Corpus.prepare(raw).as[(Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(all(3L)._3 === "some text with punct")
    assert(all(1L)._2 === "A Tabbed Title")
    assert(all(2L)._3 === "")
    val limited = Corpus.prepare(raw, limit = 2).as[(Long, String, String)]
      .collect().map(_._1).toSeq
    assert(limited === Seq(1L, 2L)) // ordered by id, not partition order
  }

  test("ingest writes corpus parquet plus reference-shaped side outputs") {
    val dir = Files.createTempDirectory("corpus").toString
    Corpus.ingest(raw, dir, writeTsv = true, writePerDoc = true)
    assert(spark.read.parquet(s"$dir/corpus").count() === 3)
    val tsvBack = graft.sources.TsvCorpus.read(spark, s"$dir/corpus_tsv")
    assert(tsvBack.count() === 3)
    assert(Files.list(Paths.get(s"$dir/docs")).count() === 3)
  }

  test("ScoreMerge aggregator: sums scores, keeps first non-empty title") {
    val agg = new TypedAggregators.ScoreMerge().toColumn
    val res = Seq(
      (10L, ("", 1.5)), (10L, ("Doc Ten", 2.0)), (10L, ("Other", 0.5)),
      (20L, ("Doc Twenty", 1.0))
    ).toDS().groupByKey(_._1).mapValues(_._2).agg(agg)
      .collect().toMap
    assert(res(10L)._2 === 4.0)
    assert(res(10L)._1 === "Doc Ten")
    assert(res(20L) === (("Doc Twenty", 1.0)))
  }

  test("TopK aggregator matches orderBy+limit per group") {
    val data = Tables.load(spark, sf0001, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .as[(Long, Long, Double)]
    val agg = new TypedAggregators.TopK(3).toColumn
    val typed = data.groupByKey(_._1).mapValues(r => (r._2, r._3)).agg(agg)
      .collect().toMap
    val viaWindow = SparkEntry.queries("q_window_topn")(spark, sf0001)
      .as[(Long, Long, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(r => (r._2, r._3)).toSeq).toMap
    assert(typed.keySet === viaWindow.keySet)
    viaWindow.foreach { case (k, expected) =>
      assert(typed(k).toSeq === expected, s"mismatch for customer $k")
    }
  }
}
