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

  test("portable hash is in [0, 2^60) and stable") {
    forAllSeeded(rawText, n = 60) { s =>
      val h = Seq(s).toDF("t")
        .select(graft.dedup.Dedup.portableTokenHash($"t")).as[Long].first()
      assert(h >= 0L && h < (1L << 60), s"hash out of range for '$s': $h")
      val h2 = Seq(s).toDF("t")
        .select(graft.dedup.Dedup.portableTokenHash($"t")).as[Long].first()
      assert(h === h2)
    }
  }

  test("sampling nests and splits are exhaustive for arbitrary fractions/weights") {
    import graft.pipeline.Sampling
    val ids = (0L until 200L).toDF("id")
    val fracPair = for {
      a <- Gen.choose(0.05, 0.45); b <- Gen.choose(0.5, 0.95)
    } yield (a, b)
    forAllSeeded(fracPair, n = 10) { case (small, big) =>
      val s1 = Sampling.deterministicSample(ids, "id", small).as[Long].collect().toSet
      val s2 = Sampling.deterministicSample(ids, "id", big).as[Long].collect().toSet
      assert(s1.subsetOf(s2), s"nesting violated at ($small, $big)")
    }
    val weightsGen = Gen.listOfN(3, Gen.choose(0.1, 1.0)).map { ws =>
      val t = ws.sum
      ws.zipWithIndex.map { case (w, i) => s"s$i" -> w / t }
    }
    forAllSeeded(weightsGen, n = 10) { ws =>
      // renormalize to sum exactly 1.0 for the require
      val fixed = ws.init :+ (ws.last._1 -> (1.0 - ws.init.map(_._2).sum))
      val counts = Sampling.assignSplit(ids, "id", fixed)
        .groupBy("split").count().as[(String, Long)].collect().toMap
      assert(counts.values.sum === 200L, s"split not exhaustive: $counts")
    }
  }

  test("topKPerKey equals the window formulation for arbitrary k") {
    val orders = Tables.load(spark, sf0001, "orders").limit(2000)
    import org.apache.spark.sql.expressions.Window
    forAllSeeded(Gen.choose(1, 7), n = 5) { k =>
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      val viaWindow = orders.withColumn("rn", row_number().over(w))
        .filter($"rn" <= k).select($"o_orderkey").as[Long].collect().toSet
      val viaOp = org.apache.spark.sql.graft.TopKOps.topKPerKey(orders,
          Seq("o_custkey"), Seq("o_totalprice" -> false, "o_orderkey" -> true), k)
        .select($"o_orderkey").as[Long].collect().toSet
      assert(viaOp === viaWindow, s"mismatch at k=$k")
    }
  }

  test("char histogram equals per-letter counting on arbitrary text") {
    import org.apache.spark.sql.graft.CharHistogram
    forAllSeeded(rawText, n = 30) { text =>
      val bins = Seq(text).toDF("t")
        .select(CharHistogram.charHist(lower($"t"))).as[Seq[Long]].head()
      val lowered = text.toLowerCase
      val expected = ('a' to 'z').map(ch => lowered.count(_ == ch).toLong)
      assert(bins === expected, s"mismatch on ${text.take(40)}")
    }
  }

  test("funnel times equal a sequential reference scan on arbitrary event logs") {
    import graft.operators.Funnel
    val steps = Seq("view", "click", "purchase")
    val eventGen = Gen.listOfN(40, for {
      u <- Gen.choose(0L, 3L)
      sec <- Gen.choose(0L, 50L)
      ty <- Gen.oneOf("view", "click", "purchase", "error")
    } yield (u, sec, ty))
    forAllSeeded(eventGen, n = 15) { evts =>
      // reference: greedy earliest qualifying event per step, per user
      val expect = evts.groupBy(_._1).flatMap { case (u, es) =>
        val t1 = es.filter(_._3 == steps.head).map(_._2).minOption
        t1.map { first =>
          val times = steps.tail.scanLeft(Option(first)) { (prev, st) =>
            prev.flatMap(p => es.filter(e => e._3 == st && e._2 > p).map(_._2).minOption)
          }
          u -> times
        }
      }
      val got = Funnel.funnelTimes(
          evts.toDF("user_id", "sec", "event_type")
            .select($"user_id", $"sec".cast("timestamp").as("ts"), $"event_type"),
          steps)
        .select($"user_id", $"t1".cast("long"), $"t2".cast("long"), $"t3".cast("long"))
        .as[(Long, Option[Long], Option[Long], Option[Long])].collect()
        .map(r => r._1 -> Seq(r._2, r._3, r._4)).toMap
      assert(got === expect, s"funnel mismatch on ${evts.take(10)}…")
    }
  }

  test("chunking equals direct token slicing on arbitrary text") {
    import graft.pipeline.Chunking
    val (size, overlap) = (7, 2)
    val stride = size - overlap
    forAllSeeded(rawText, n = 20) { text =>
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val toks = df.select(explode(Analyzer.tokens($"text"))).as[String].collect().toSeq
      val chunks = Chunking.chunkTokens(df, size, overlap).orderBy("chunk_id")
        .select($"chunk_id", $"n_tokens", $"chunk").as[(Long, Long, String)].collect()
      if (toks.isEmpty) assert(chunks.isEmpty)
      else {
        assert(chunks.length === (toks.length - 1) / stride + 1)
        chunks.foreach { case (k, n, c) =>
          val expect = toks.slice(k.toInt * stride, k.toInt * stride + size)
          assert(n === expect.length.toLong)
          assert(c === expect.mkString(" "), s"chunk $k mismatch")
        }
      }
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
