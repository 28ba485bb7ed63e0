package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.JsonlCorpus

class JsonlSpec extends SparkSpec {
  import spark.implicits._

  test("JSONL roundtrip preserves the corpus") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text", "lang", "source")
    val path = Files.createTempDirectory("jsonl").toString
    JsonlCorpus.write(docs, path)
    val back = JsonlCorpus.read(spark, path)
      .as[(Long, String, String, String)].collect().toSet
    assert(back === docs.as[(Long, String, String, String)].collect().toSet)
  }

  test("malformed and id-less lines are dropped and accounted") {
    val path = Files.createTempDirectory("jsonl-bad").toString
    Seq(
      """{"doc_id": 1, "text": "good", "lang": "en", "source": "a"}""",
      """{"doc_id": 2, "text": "also good"}""",
      """{"text": "no id"}""",
      """not json at all{{{"""
    ).toDF("value").coalesce(1).write.mode("overwrite").text(path)
    val good = JsonlCorpus.read(spark, path)
    assert(good.select("doc_id").as[Long].collect().toSet === Set(1L, 2L))
    val (goodCounted, bad) = JsonlCorpus.readCounting(spark, path)
    assert(goodCounted.count() === 2L)
    assert(bad === 2L)
  }
}
