package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.sources.{PerDocTextSink, TsvCorpus}

class MultimodalSourcesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "Plain Title", "hello world"),
    (2L, "Tabs\tAnd\nNewlines", "line one\nline two"),
    (3L, "", "")
  ).toDF("doc_id", "title", "text")

  test("media: binary payload roundtrip with declarative metadata") {
    implicit val s = spark
    val m = Multimodal.asMedia(corpus, "doc_id", "text")
    val meta = Multimodal.mediaMeta(m).as[(Long, String, Long, Boolean)]
      .collect().map(r => r._1 -> r._3).toMap
    assert(meta === Map(1L -> 11L, 2L -> 17L, 3L -> 0L))
  }

  test("media: feature extraction over bytes is deterministic") {
    implicit val s = spark
    val feats = Multimodal.extractFeatures(
      Multimodal.asMedia(corpus, "doc_id", "text").as[Multimodal.MediaRow])
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).n_bytes === 11)
    assert(feats(1L).head_byte === 'h'.toInt)
    assert(feats(1L).byte_sum === "hello world".getBytes.map(_ & 0xFF).sum)
    assert(feats(3L).head_byte === -1)
    assert(feats(3L).entropy_proxy === 0.0)
  }

  test("media: resize and frame-sample stubs preserve ids and shapes") {
    implicit val s = spark
    val m = Multimodal.asMedia(corpus, "doc_id", "text").as[Multimodal.MediaRow]
    val resized = Multimodal.resizeStub(m, 2, 2).collect().map(r => r.media_id -> r).toMap
    assert(resized(1L).bytes.length === 4)
    assert(resized(1L).meta.width === 2)
    val frames = Multimodal.frameSampleStub(m, 4, 2)
      .as[(Long, Long, Array[Byte])].collect()
    val doc1 = frames.filter(_._1 == 1L).map(_._2).sorted
    assert(doc1 === Seq(0L, 2L)) // 11 bytes → frames 0,1,2; stride 2 keeps 0,2
  }

  test("TSV corpus sink/source roundtrip sanitizes tabs and newlines") {
    val dir = Files.createTempDirectory("tsv").toString
    TsvCorpus.write(corpus, dir)
    val back = TsvCorpus.read(spark, dir).as[(Long, String, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(back.keySet === Set(1L, 2L, 3L))
    assert(back(1L) === ((1L, "Plain Title", "hello world")))
    assert(back(2L)._2 === "Tabs And Newlines")
    assert(back(2L)._3 === "line one line two")
  }

  test("TSV source drops blank and malformed lines") {
    val dir = Files.createTempDirectory("tsv-bad").toString
    Seq("7\tok title\tok text", "", "not enough fields", "x\ty\tz\textra")
      .toDF("value").write.mode("overwrite").text(dir)
    val rows = TsvCorpus.read(spark, dir).as[(Long, String, String)].collect()
    assert(rows.toSeq === Seq((7L, "ok title", "ok text")))
  }

  test("per-document sink writes <id>_<safe_title>.txt per row") {
    val dir = Files.createTempDirectory("perdoc").toString
    PerDocTextSink.write(corpus, dir)
    val names = Files.list(Paths.get(dir)).toArray.map(_.toString.split("/").last).sorted
    assert(names.toSeq === Seq("1_Plain_Title.txt", "2_Tabs_And_Newlines.txt", "3_.txt"))
    val content = new String(Files.readAllBytes(Paths.get(dir, "1_Plain_Title.txt")))
    assert(content === "hello world")
  }
}
