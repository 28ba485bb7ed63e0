package graft

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: star center outranks leaves; symmetric nodes tie exactly") {
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val r = Graph.pageRank(pairs, "a", "b", iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(r.keySet === Set(1L, 2L, 3L, 4L))
    assert(r(1L) > r(2L), s"center must outrank leaves: $r")
    // leaves are graph-symmetric — identical rank, bit for bit
    assert(r(2L) === r(3L) && r(3L) === r(4L), s"leaf ranks must tie: $r")
  }

  test("pageRank is partitioning-independent (decimal-summed contributions)") {
    val pairs = (1L to 40L).map(i => (i, i % 7 + 100L)).toDF("a", "b")
    val one = Graph.pageRank(pairs.coalesce(1), "a", "b", iters = 3)
      .as[(Long, Double)].collect().toMap
    val many = Graph.pageRank(pairs.repartition(13), "a", "b", iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(one === many)
  }
}
