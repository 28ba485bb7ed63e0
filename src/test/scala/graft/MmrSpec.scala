package graft

import graft.similarity.Mmr

class MmrSpec extends SparkSpec {
  import spark.implicits._

  test("rerank picks by relevance first, then trades off max-sim to selected") {
    // Query 1: a(0.9) b(0.8) c(0.7); a~b nearly identical (0.95),
    // a~c and b~c dissimilar (0.1). λ=0.7:
    //   step1: a (top rel)
    //   step2: b scores .7*.8-.3*.95=0.275; c scores .7*.7-.3*.1=0.46 → c
    //   step3: b (only one left)
    val cands = Seq((1L, 10L, 0.9), (1L, 11L, 0.8), (1L, 12L, 0.7))
      .toDF("query_id", "vec_id", "rel")
    val sims = Seq(
      (1L, 10L, 11L, 0.95), (1L, 11L, 10L, 0.95),
      (1L, 10L, 12L, 0.1), (1L, 12L, 10L, 0.1),
      (1L, 11L, 12L, 0.1), (1L, 12L, 11L, 0.1))
      .toDF("query_id", "a", "b", "sim")
    val r = Mmr.rerank(cands, sims, k = 3, lambda = 0.7)
      .collect().map(x => x.getLong(1) -> x.getLong(2)).toMap
    assert(r == Map(1L -> 10L, 2L -> 12L, 3L -> 11L))
  }

  test("rerank breaks score ties by vec_id and treats queries independently") {
    val cands = Seq(
      (1L, 20L, 0.5), (1L, 21L, 0.5),
      (2L, 30L, 0.4), (2L, 31L, 0.9))
      .toDF("query_id", "vec_id", "rel")
    val sims = Seq(
      (1L, 20L, 21L, 0.0), (1L, 21L, 20L, 0.0),
      (2L, 30L, 31L, 0.0), (2L, 31L, 30L, 0.0))
      .toDF("query_id", "a", "b", "sim")
    val r = Mmr.rerank(cands, sims, k = 2, lambda = 0.7)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(r == Map((1L, 1L) -> 20L, (1L, 2L) -> 21L,
      (2L, 1L) -> 31L, (2L, 2L) -> 30L))
  }

  test("candidatePairSims is symmetric and excludes self-pairs") {
    val e = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)), (3L, Seq(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val cands = Seq((9L, 1L), (9L, 3L)).toDF("query_id", "vec_id")
    val r = Mmr.candidatePairSims(cands, e)
      .collect().map(x => (x.getLong(1), x.getLong(2)) -> x.getDouble(3)).toMap
    assert(r.keySet == Set((1L, 3L), (3L, 1L)))
    assert(math.abs(r((1L, 3L)) - math.sqrt(0.5)) < 1e-5)
  }
}
