package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Chunking

class CdcChunkSpec extends SparkSpec {
  import spark.implicits._

  private val text = "alpha bravo charlie delta echo foxtrot golf hotel " +
    "india juliet kilo lima mike november oscar papa quebec romeo sierra " +
    "tango uniform victor whiskey xray yankee zulu one two three four"

  test("chunks partition the token stream exactly") {
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val chunks = Chunking.contentDefinedChunks(df, modulus = 4).collect()
    val nTok = text.split(" ").length
    assert(chunks.map(_.getLong(2)).sum == nTok)
    // chunk ids are 0..k consecutive
    val ids = chunks.map(_.getLong(1)).sorted
    assert(ids.toSeq == (0L until ids.length).toSeq)
  }

  test("boundaries are content-defined: a prefix insertion leaves later chunks intact") {
    val base = Seq((1L, text)).toDF("doc_id", "text")
    val shifted = Seq((1L, "inserted " + text)).toDF("doc_id", "text")
    def fps(df: org.apache.spark.sql.DataFrame) =
      Chunking.contentDefinedChunks(df, modulus = 4)
        .select("fingerprint").as[Long].collect().toSet
    val a = fps(base)
    val b = fps(shifted)
    assert(a.size >= 3, s"need several chunks for the test, got ${a.size}")
    // every chunk after the first boundary is identical content → its
    // fingerprint survives the shift; only the first chunk can change
    assert((a intersect b).size >= a.size - 1,
      s"content-defined chunks must be shift-stable: ${a.size} vs shared ${(a intersect b).size}")
  }

  test("identical chunks in different documents share fingerprints") {
    val df = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val byDoc = Chunking.contentDefinedChunks(df, modulus = 4).collect()
      .groupBy(_.getLong(0)).map { case (d, rows) =>
        d -> rows.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      }
    assert(byDoc(1L) == byDoc(2L))
  }

  test("chunk dedup: shared chunks dropped everywhere, lone docs reassemble verbatim") {
    val df = Seq((1L, text), (2L, text), (3L, "completely different filler words"))
      .toDF("doc_id", "text")
    val out = Chunking.chunkDedupClean(df, modulus = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // docs 1 and 2 are identical → every chunk shared → all dropped
    Seq(1L, 2L).foreach { d =>
      val (n, dropped, clean) = out(d)
      assert(dropped == n && clean == "", s"doc $d: ($n, $dropped, '$clean')")
    }
    // doc 3 shares nothing → reassembly in chunk order is its normalized text
    val (n3, dropped3, clean3) = out(3L)
    assert(dropped3 == 0L)
    assert(clean3 == "completely different filler words",
      s"lossless reassembly, got '$clean3'")
    assert(n3 >= 1L)
  }
}
