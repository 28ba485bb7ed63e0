package graft

import org.apache.spark.sql.functions._
import graft.similarity.Similarity
import graft.text.TextAnalysis

class SimilarityTextSpec extends SparkSpec {
  import spark.implicits._

  test("cosine matches hand computation and is order-deterministic") {
    val df = Seq((Array(1.0f, 0.0f, 2.0f), Array(2.0f, 1.0f, 0.0f)))
      .toDF("a", "b")
    val cos = df.select(Similarity.cosine($"a", $"b")).as[Double].first()
    val expected = 2.0 / (math.sqrt(5.0) * math.sqrt(5.0))
    assert(math.abs(cos - expected) < 1e-12)
  }

  test("bruteForceTopK: k nearest, self excluded, ranks 1..k") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(1.0f, 0.05f))
    ).toDF("vec_id", "embedding")
    val res = Similarity.bruteForceTopK(e, e.filter($"vec_id" === 0L), 2)
      .as[(Long, Long, Double, Long)].collect().sortBy(_._4)
    assert(res.map(_._2).toSeq === Seq(3L, 1L)) // 3 is closer to 0 than 1
    assert(res.map(_._4).toSeq === Seq(1L, 2L))
    assert(res.forall(_._1 == 0L))
  }

  test("lshTopK returns a subset of brute-force candidates with same scoring") {
    val e = Tables.load(spark, sf0001, "embeddings")
    val q = e.filter($"vec_id" === 0L)
    val brute = Similarity.bruteForceTopK(e, q, 1000)
      .as[(Long, Long, Double, Long)].collect().map(r => r._2 -> r._3).toMap
    val lsh = Similarity.lshTopK(e, q, 10, nPlanes = 6)
      .as[(Long, Long, Double, Long)].collect()
    assert(lsh.nonEmpty)
    lsh.foreach { r => assert(math.abs(brute(r._2) - r._3) < 1e-12) }
  }

  test("langId picks the best marker list with first-wins ties, und on none") {
    val df = Seq(
      (1L, "the cat and the dog is in a house"),
      (2L, "der hund und die katze ist nicht da"),
      (3L, "xyzzy qwerty plugh"),
      (4L, "")
    ).toDF("doc_id", "text")
    val m = df.select($"doc_id", TextAnalysis.langId($"text")).as[(Long, String)]
      .collect().toMap
    assert(m === Map(1L -> "en", 2L -> "de", 3L -> "und", 4L -> "und"))
  }

  test("quality features: exact arithmetic on a known doc") {
    val df = Seq((7L, "the quick fox!!")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityFeatures(df)
      .as[(Long, Long, Double, Double, Double, Double)].first()
    val (_, nTok, avgLen, alnum, stop, score) = r
    assert(nTok === 3)
    assert(math.abs(avgLen - (3 + 5 + 3) / 3.0) < 1e-12)
    // raw lower text "the quick fox!!": non-space chars 13, alnum 11
    assert(math.abs(alnum - 11.0 / 13.0) < 1e-12)
    assert(math.abs(stop - 1.0 / 3.0) < 1e-12)
    assert(score > 0 && score <= 1.0)
  }

  test("bigram LM score: common transitions beat rare ones; exact on a tiny corpus") {
    // 'a b' occurs 3x from docs 1-3; doc 4's 'x y' occurs once
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "x y")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScore(docs)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // c12(a,b)=3, c1(a)=3 → ln(1)=0; c12(x,y)=1, c1(x)=1 → ln(1)=0
    assert(got(1L) === ((1L, 0.0)) && got(4L) === ((1L, 0.0)))

    // now make 'a' ambiguous: a→b 3x, a→z 1x ⇒ P(b|a)=3/4, P(z|a)=1/4
    val docs2 = docs.union(Seq((5L, "a z")).toDF("doc_id", "text"))
    val got2 = TextAnalysis.bigramLmScore(docs2)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(math.abs(got2(1L) - math.round(math.log(0.75) * 1e6) / 1e6) < 1e-9)
    assert(math.abs(got2(5L) - math.round(math.log(0.25) * 1e6) / 1e6) < 1e-9)
    assert(got2(1L) > got2(5L), "frequent transition must outscore rare one")
  }

  test("fingerprint: deterministic, order-sensitive, 0 for empty") {
    val df = Seq((1L, "a b"), (2L, "b a"), (3L, ""), (4L, "a b")).toDF("doc_id", "text")
    val m = df.select($"doc_id", TextAnalysis.fingerprint($"text")).as[(Long, Long)]
      .collect().toMap
    assert(m(1L) === m(4L))
    assert(m(1L) !== m(2L)) // order matters
    assert(m(3L) === 0L)
    // hand-compute: code('a')=97*131+1=12708, code('b')=98*131+1=12839
    assert(m(1L) === (12708L * 31 + 12839) % 1000000007)
  }

  test("bpeish token count: alpha runs + digits + symbols") {
    val df = Seq(Tuple1("ab 12 c!")).toDF("text")
    val n = df.select(TextAnalysis.bpeishCount($"text")).as[Long].first()
    assert(n === 5) // "ab","1","2","c","!"
  }
}
