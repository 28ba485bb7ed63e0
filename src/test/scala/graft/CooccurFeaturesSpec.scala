package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Features
import graft.similarity.Eval
import graft.text.Cooccurrence

class CooccurFeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("pmiPairs counts windowed unordered pairs exactly") {
    // "a b c a": window 2 events: (a,b)(a,c) (b,c)(b,a) (c,a) → canonical
    // (a,b):2 (a,c):2 (b,c):1; T=4 tokens, P=5 events
    val df = Seq((1L, "a b c a")).toDF("doc_id", "text")
    val r = Cooccurrence.pmiPairs(df, window = 2, minCount = 1)
      .collect().map(x => ((x.getString(0), x.getString(1)), x.getLong(2))).toMap
    assert(r == Map(("a", "b") -> 2L, ("a", "c") -> 2L, ("b", "c") -> 1L))
  }

  test("pmiPairs pmi matches the closed form") {
    val df = Seq((1L, "a b c a")).toDF("doc_id", "text")
    val r = Cooccurrence.pmiPairs(df, window = 2, minCount = 1)
      .filter(col("term_a") === "b" && col("term_b") === "c")
      .collect().head.getDouble(3)
    // pmi(b,c) = ln((1·4·4)/(5·1·1))
    assert(math.abs(r - math.log(16.0 / 5.0)) < 1e-6)
  }

  test("pmiPairs does not pair across documents") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    assert(Cooccurrence.pmiPairs(df, window = 5, minCount = 1).isEmpty)
  }

  test("hashedTf preserves total token mass in bounded buckets") {
    val df = Seq((1L, "x y z x"), (2L, "y y")).toDF("doc_id", "text")
    val r = Features.hashedTf(df, nBuckets = 8).collect()
    assert(r.map(_.getLong(2)).sum == 6L)
    assert(r.forall(x => x.getLong(1) >= 0 && x.getLong(1) < 8))
    // same token always lands in the same bucket: doc 2's "y y" is one row
    assert(r.count(_.getLong(0) == 2L) == 1)
  }

  test("recallAtK scores hits / exact size per query") {
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L), (2L, 21L))
      .toDF("query_id", "vec_id")
    val approx = Seq((1L, 10L), (1L, 99L), (3L, 30L)).toDF("query_id", "vec_id")
    val r = Eval.recallAtK(exact, approx).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r == Map(1L -> ((2L, 1L, 0.5)), 2L -> ((2L, 0L, 0.0))))
  }

  test("reciprocalRank: first hit position, 0-filled misses, rank cutoff honored") {
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 20L), (3L, 30L))
      .toDF("query_id", "vec_id")
    val approx = Seq(
      (1L, 99L, 1L), (1L, 11L, 2L), (1L, 10L, 3L), // first hit at rank 2
      (2L, 98L, 1L), (2L, 20L, 4L),                // hit beyond the k=3 cutoff
      (3L, 97L, 1L))                               // no hit at all
      .toDF("query_id", "vec_id", "rank")
    val r = Eval.reciprocalRank(exact, approx, 3).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    assert(r == Map(1L -> ((2L, 0.5)), 2L -> ((0L, 0.0)), 3L -> ((0L, 0.0))))
  }

  test("ndcgAtK is 1 for a perfect list, discounts rank inversions, 0 for misses") {
    val exact = Seq(
      (1L, 10L, 0.9, 1L), (1L, 11L, 0.5, 2L),
      (2L, 20L, 0.8, 1L), (2L, 21L, 0.4, 2L),
      (3L, 30L, 0.7, 1L), (3L, 31L, 0.6, 2L))
      .toDF("query_id", "vec_id", "rel", "rank")
    val approx = Seq(
      (1L, 10L, 1L), (1L, 11L, 2L),  // perfect
      (2L, 21L, 1L), (2L, 20L, 2L),  // swapped
      (3L, 99L, 1L), (3L, 98L, 2L))  // all misses
      .toDF("query_id", "vec_id", "rank")
    val r = Eval.ndcgAtK(exact, approx, 2).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(1L) == 1.0)
    assert(r(3L) == 0.0)
    val w2 = graft.similarity.Eval.dcgWeight(2)
    val expected2 = (0.4 + 0.8 * w2) / (0.8 + 0.4 * w2)
    assert(math.abs(r(2L) - expected2) < 1e-6)
  }

  test("triangleCounts finds each node's triangle participation") {
    // K4 on 1..4 has 4 triangles, every node in 3; node 5 dangles
    val edges = (for {
      a <- 1L to 4L; b <- (a + 1) to 4L
    } yield (a, b)) :+ ((4L, 5L))
    val r = graft.operators.Graph.triangleCounts(
        edges.toDF("a", "b"), "a", "b")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }
}
