package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** Z-order clustering ([[graft.operators.ZOrder]]): value correctness of
  * the interleave, write round-trip identity, and the data-skipping
  * evidence — per-file footer rectangles under a z-ordered layout are
  * small boxes, so range predicates on EITHER dimension can skip most
  * files (vs a single-column sort, where the secondary column's file
  * bounds are useless). */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def refInterleave(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zValue2 matches the reference bit interleave") {
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (12345L, 6789L),
      (1048575L, 1L), (999999L, 999998L))
    val got = samples.toDF("x", "y")
      .select(ZOrder.zValue2(col("x"), col("y"), 20).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === samples.map { case (x, y) => refInterleave(x, y, 20) })
    // first cells of the curve, by hand: (0,0)=0 (1,0)=1 (0,1)=2 (1,1)=3
    val tiny = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L)).toDF("x", "y")
      .select(ZOrder.zValue2(col("x"), col("y"), 4)).collect().map(_.getLong(0))
    assert(tiny.toSeq === Seq(0L, 1L, 2L, 3L))
  }

  test("zValue2Sql is the same function (Spark-evaluated)") {
    val df = Seq((12345L, 6789L), (7L, 900001L)).toDF("x", "y")
    val viaSql = df.selectExpr(s"${ZOrder.zValue2Sql("x", "y", 20)} AS z")
      .collect().map(_.getLong(0)).toSeq
    val viaCol = df.select(ZOrder.zValue2(col("x"), col("y"), 20))
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql === viaCol)
  }

  test("z-ordered rewrite preserves the data exactly and clusters files into rectangles") {
    val li = Tables.load(spark, sf0001, "lineitem")
    val path = queries.QueryGroup.scratchDir("graft-zorder")
    ZOrder.writeZOrdered(li, path, "l_orderkey", "l_partkey", nFiles = 32)
    val back = spark.read.parquet(path)

    // round-trip identity (multiset equality via exceptAll both ways)
    assert(back.count() === li.count())
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty)

    // footer rectangles: per-file min/max of both dimensions
    val rects = back.groupBy(input_file_name().as("f"))
      .agg(min("l_orderkey").as("xmin"), max("l_orderkey").as("xmax"),
           min("l_partkey").as("ymin"), max("l_partkey").as("ymax"))
      .collect()
    val nFiles = rects.length
    assert(nFiles >= 8, s"expected a multi-file layout, got $nFiles")

    // a box predicate on BOTH dims touches few files... (a file must be
    // read iff its [min,max]×[min,max] rectangle intersects the box)
    val (x0, x1, y0, y1) = (100L, 300L, 10L, 60L)
    val boxHits = rects.count { r =>
      r.getLong(1) <= x1 && r.getLong(2) >= x0 &&
      r.getLong(3) <= y1 && r.getLong(4) >= y0
    }
    assert(boxHits <= nFiles / 4,
      s"box intersects $boxHits of $nFiles z-ordered files — no locality")

    // ...and a predicate on the SECONDARY dim alone still skips: under an
    // x-sort every file spans ~the full y range; under z-order most files'
    // y-rectangles miss a narrow y band.
    val yHits = rects.count(r => r.getLong(3) <= y1 && r.getLong(4) >= y0)
    assert(yHits <= nFiles / 2,
      s"y-band intersects $yHits of $nFiles z-ordered files — no y locality")

    // contrast: the x-sorted layout cannot skip on y
    val sortedPath = queries.QueryGroup.scratchDir("graft-xsort")
    li.repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(sortedPath)
    val sortedRects = spark.read.parquet(sortedPath)
      .groupBy(input_file_name().as("f"))
      .agg(min("l_partkey").as("ymin"), max("l_partkey").as("ymax"))
      .collect()
    val sortedYHits = sortedRects.count(r => r.getLong(1) <= y1 && r.getLong(2) >= y0)
    assert(sortedYHits === sortedRects.length,
      "x-sorted layout unexpectedly has y locality — fixture degenerate?")
  }

  test("writeZOrdered refuses a clashing scratch column") {
    val bad = Seq((1L, 2L, 3L)).toDF("x", "y", "__z")
    val e = intercept[IllegalArgumentException] {
      ZOrder.writeZOrdered(bad, "/tmp/never-written", "x", "y", 2)
    }
    assert(e.getMessage.contains("__z"))
  }
}
