package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.TsvCorpus

/** The DataSource V2 connector (`format("graft-tsv")`) against the
  * Column-expression reader it upgrades: same rows, same malformed-line
  * policy, plus reader-level column pruning.
  */
class TsvProviderSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tsvDir: String = {
    val docs = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"source".as("title"), $"text")
    val dir = Files.createTempDirectory("dsv2-tsv").toString
    TsvCorpus.write(docs, dir)
    dir
  }

  test("connector reads exactly what TsvCorpus.read parses") {
    val viaExpr = TsvCorpus.read(spark, tsvDir)
      .as[(Long, String, String)].collect().toSet
    val viaDsv2 = spark.read.format("graft-tsv").load(tsvDir)
      .as[(Long, String, String)].collect().toSet
    assert(viaDsv2 === viaExpr)
    assert(viaDsv2.size === 500)
  }

  test("column pruning reaches the reader (narrowed ReadSchema)") {
    val df = spark.read.format("graft-tsv").load(tsvDir).select("doc_id")
    val p = df.queryExecution.executedPlan.toString
    // DSv2 BatchScan prints its (pruned) output schema in brackets
    val scanLine = p.linesIterator.find(_.contains("BatchScan graft-tsv"))
      .getOrElse(fail(s"no graft-tsv scan in:\n$p"))
    assert(scanLine.contains("[doc_id") && !scanLine.contains("text"),
      s"text/title should be pruned at the scan: $scanLine")
    assert(df.as[Long].collect().toSet ===
      Tables.load(spark, sf0001, "documents").select("doc_id").as[Long].collect().toSet)
  }

  test("doc_id predicates push into the reader and prune correctly") {
    val df = spark.read.format("graft-tsv").load(tsvDir)
      .filter($"doc_id" >= 100L && $"doc_id" < 110L)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("GreaterThanOrEqual(doc_id,100)") &&
      p.contains("LessThan(doc_id,110)"),
      s"filters not pushed into scan description:\n$p")
    assert(df.select("doc_id").as[Long].collect().toSet === (100L until 110L).toSet)
  }

  test("connector write side: roundtrip through format(graft-tsv) both ways") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"source".as("title"), $"text")
    val dir = Files.createTempDirectory("dsv2-w").toString + "/out"
    docs.write.format("graft-tsv").mode("overwrite").save(dir)
    val back = spark.read.format("graft-tsv").load(dir)
    // values match the expression-sink (TsvCorpus.write) semantics:
    // tabs/newlines squashed inside fields
    val expected = TsvCorpus.read(spark, {
      val d2 = Files.createTempDirectory("dsv2-w2").toString
      TsvCorpus.write(docs, d2); d2
    }).as[(Long, String, String)].collect().toSet
    assert(back.as[(Long, String, String)].collect().toSet === expected)

    // overwrite truncates
    docs.limit(10).write.format("graft-tsv").mode("overwrite").save(dir)
    assert(spark.read.format("graft-tsv").load(dir).count() === 10L)
  }

  test("malformed lines are dropped at the source") {
    val dir = Files.createTempDirectory("dsv2-bad").toString
    Seq("1\tt1\thello world", "not-a-number\tx\ty", "2\tt2", "", "3\tt3\tbye",
      // 21 digits: all-digit but beyond Long range — must drop, not crash
      "123456789012345678901\tt\toverflow id",
      // 19 digits just over Long.MaxValue — drop; 19 digits within — keep
      "9999999999999999999\tt\tover max",
      "1234567890123456789\tt\tnineteen digits ok")
      .toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    val rows = spark.read.format("graft-tsv").load(dir)
      .select("doc_id").as[Long].collect().toSet
    assert(rows === Set(1L, 3L, 1234567890123456789L))
  }

  test("write commits via staging rename; leftover staging files are ignored") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select($"doc_id", $"source".as("title"), $"text").limit(20)
    val dir = Files.createTempDirectory("dsv2-stage").toString + "/out"
    docs.write.format("graft-tsv").mode("overwrite").save(dir)
    // no staging residue after a successful commit
    val names = new java.io.File(dir).listFiles().map(_.getName)
    assert(names.forall(n => !n.endsWith(".inprogress")), names.mkString(","))
    // a crashed attempt's orphan staging file is not read as data
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, ".part-9-999.tsv.inprogress"),
      "999\tghost\tpartial row that never committed\n")
    val ids = spark.read.format("graft-tsv").load(dir)
      .select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(999L) && ids.size === 20)
  }
}
