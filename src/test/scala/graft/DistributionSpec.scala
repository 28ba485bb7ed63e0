package graft

import org.apache.spark.sql.functions._

import graft.operators.Distribution

class DistributionSpec extends SparkSpec {
  import spark.implicits._

  test("robustOutliers flags only far-from-median rows") {
    // group g: median 10, MAD 1 → cut at |v-10| > 3*1.4826 ≈ 4.45
    val df = (Seq((1L, 8.0), (2L, 9.0), (3L, 10.0), (4L, 11.0), (5L, 12.0),
      (6L, 100.0), (7L, 10.5))
      .map { case (id, v) => ("g", id, v) })
      .toDF("grp", "id", "v")
    val out = Distribution.robustOutliers(df, "grp", "id", "v")
      .collect().map(_.getLong(1)).toSet
    assert(out == Set(6L))
  }

  test("robustOutliers is per-group") {
    val df = Seq(
      ("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0), ("a", 4L, 50.0),
      ("b", 5L, 50.0), ("b", 6L, 51.0), ("b", 7L, 52.0), ("b", 8L, 53.0))
      .toDF("grp", "id", "v")
    val out = Distribution.robustOutliers(df, "grp", "id", "v")
      .collect().map(_.getLong(1)).toSet
    // 50 is an outlier in group a but perfectly normal in group b
    assert(out == Set(4L))
  }

  test("equiDepthHistogram buckets hold near-equal counts and cover all rows") {
    val df = (1 to 1000).map(i => i.toDouble).toDF("v")
    val h = Distribution.equiDepthHistogram(df, "v", 10).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(h.keySet == (0L to 9L).toSet)
    assert(h.values.map(_._1).sum == 1000L)
    // exact percentiles on 1..1000 give buckets of ~100
    assert(h.values.forall { case (n, _, _) => n >= 99 && n <= 101 })
    // bucket ranges are ordered and non-overlapping
    val sorted = h.toSeq.sortBy(_._1).map(_._2)
    sorted.sliding(2).foreach {
      case Seq((_, _, hi1), (_, lo2, _)) => assert(hi1 <= lo2)
      case _ => ()
    }
  }
}
