package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.RewriteVectorDot
import graft.similarity.Similarity

class RewriteRuleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (Array(0.5f, -1.0f, 2.5f), Array(1.0f, 1.0f, 1.0f))
  ).toDF("a", "b")

  test("rule rewrites the declarative fold into FloatVectorDot") {
    spark.experimental.extraOptimizations = Seq(RewriteVectorDot)
    try {
      // range-backed (a LocalRelation would be eagerly evaluated by
      // ConvertToLocalRelation before extra optimizer rules run)
      val df = spark.range(2)
        .select(array(lit(1.0f), lit(2.0f)).as("a"), array(lit(3.0f), lit(4.0f)).as("b"))
        .select(Similarity.dot($"a", $"b").as("d"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.toLowerCase.contains("floatvectordot"),
        s"rewrite did not fire:\n$optimized")
      assert(df.as[Double].collect().toSeq === Seq(11.0, 11.0))
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("rewritten and declarative results are bit-identical on fixtures") {
    val e = Tables.load(spark, sf0001, "embeddings").limit(50)
    val pairs = e.toDF("ia", "va", "la").crossJoin(e.toDF("ib", "vb", "lb"))
      .filter($"ia" < $"ib")
    val declarative = pairs.select($"ia", $"ib", Similarity.dot($"va", $"vb").as("d"))
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    spark.experimental.extraOptimizations = Seq(RewriteVectorDot)
    try {
      val df = pairs.select($"ia", $"ib", Similarity.dot($"va", $"vb").as("d"))
      assert(df.queryExecution.optimizedPlan.toString.toLowerCase.contains("floatvectordot"))
      df.as[(Long, Long, Double)].collect().foreach { r =>
        assert(declarative((r._1, r._2)) === r._3) // exact, not approximate
      }
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("NULL elements propagate NULL identically in both forms") {
    val df = spark.sql(
      """SELECT array(cast(1.0 as float), cast(null as float), cast(3.0 as float)) AS a,
                array(cast(1.0 as float), cast(1.0 as float), cast(1.0 as float)) AS b""")
    val declarative = df.select(Similarity.dot($"a", $"b").as("d")).collect()(0)
    val fast = df.select(Similarity.dotFast($"a", $"b").as("d")).collect()(0)
    assert(declarative.isNullAt(0) && fast.isNullAt(0),
      s"NULL element must null the dot in both forms: $declarative vs $fast")
  }

  test("rule does not fire on non-float arrays or different folds") {
    spark.experimental.extraOptimizations = Seq(RewriteVectorDot)
    try {
      val d = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      val sumFold = d.select(
        aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (acc, v) => acc + v).as("s"))
      assert(!sumFold.queryExecution.optimizedPlan.toString.toLowerCase.contains("floatvectordot"))
      assert(sumFold.as[Double].first() === 11.0) // still correct, just not rewritten
    } finally spark.experimental.extraOptimizations = Nil
  }
}
