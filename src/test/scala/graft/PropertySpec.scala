package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.analyzer.Analyzer
import graft.index.Indexer

/** Property-based checks over generated corpora (SURVEY.md §5.2):
  * analyzer invariants, index conservation laws, BM25 monotonicity.
  */
class PropertySpec extends SparkSpec {

  /** Deterministic property loop: ScalaCheck generators sampled over a
    * fixed fan of seeds (no scalatest bridge in the offline dep cache). */
  private def forAllSeeded[A](gen: Gen[A], n: Int = 30)(check: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .foreach(check)
    }
  import spark.implicits._

  private val rawText: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.oneOf(" ", "\t", "\n", "!", ",", ".", "-", "é", "Ж", "  "),
    Gen.oneOf("The", "QUICK", "fox42", "")
  )).map(_.mkString(""))

  private val corpusGen: Gen[List[String]] =
    Gen.listOfN(8, rawText)

  test("analyzer invariants: tokens are non-empty, lowercase-alnum only") {
    forAllSeeded(corpusGen) { texts =>
      val toks = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
        .select(explode(Analyzer.tokens($"text")).as("t"))
        .as[String].collect()
      toks.foreach { t =>
        assert(t.nonEmpty)
        assert(t.matches("[a-z0-9]+"), s"bad token '$t'")
      }
    }
  }

  test("driver-side analyzeQuery always agrees with the column analyzer") {
    forAllSeeded(rawText, n = 80) { s =>
      val colSide = Seq(s).toDF("text")
        .select(Analyzer.tokens($"text")).as[Seq[String]].first()
      assert(Analyzer.analyzeQuery(s) === colSide)
    }
  }

  test("conservation: sum of tf per doc equals doc length; df <= N") {
    forAllSeeded(corpusGen) { texts =>
      val corpus = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val ix = Indexer.buildIndex(corpus)
      val lengths = ix.docStats.as[(Long, Int)].collect().toMap
      val tfSums = ix.postings.groupBy("doc_id").agg(sum("tf").as("s"))
        .as[(Long, Long)].collect().toMap
      lengths.foreach { case (id, len) =>
        assert(tfSums.getOrElse(id, 0L) === len.toLong)
      }
      val n = texts.length.toLong
      ix.vocab.as[(String, Long)].collect().foreach { case (term, df) =>
        assert(df >= 1 && df <= n, s"df out of range for '$term'")
      }
    }
  }
}
