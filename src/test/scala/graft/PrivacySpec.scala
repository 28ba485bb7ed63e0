package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Privacy

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("small quasi-identifier groups are suppressed, large ones pass") {
    val df = Seq(
      (1L, "en", "web"), (2L, "en", "web"), (3L, "en", "web"),
      (4L, "fr", "web"),                      // group of 1 → suppressed
      (5L, "de", "book"), (6L, "de", "book")  // group of 2 → suppressed at k=3
    ).toDF("id", "lang", "source")
    val out = Privacy.kAnonymize(df, Seq("lang", "source"), 3L)
      .select("id", "lang", "source", "anon_ok")
      .as[(Long, Option[String], Option[String], Long)].collect()
      .map(r => r._1 -> r).toMap
    Seq(1L, 2L, 3L).foreach { id =>
      assert(out(id) == ((id, Some("en"), Some("web"), 1L)))
    }
    Seq(4L, 5L, 6L).foreach { id =>
      assert(out(id)._2.isEmpty && out(id)._3.isEmpty && out(id)._4 == 0L,
        s"row $id must be suppressed: ${out(id)}")
    }
  }

  test("null quasi values form a group of their own") {
    val df = Seq(
      (1L, None: Option[String]), (2L, None: Option[String]),
      (3L, Some("en"))
    ).toDF("id", "lang")
    val out = Privacy.kAnonymize(df, Seq("lang"), 2L)
      .select("id", "anon_ok").as[(Long, Long)].collect().toMap
    assert(out(1L) == 1L && out(2L) == 1L, "two null-lang rows are 2-anonymous")
    assert(out(3L) == 0L, "the lone en row is re-identifiable")
    // row count preserved — suppression, not filtering
    assert(out.size == 3)
  }
}
