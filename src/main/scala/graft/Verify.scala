package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name filter (local
    // iteration aid; the driver always passes exactly two)
    val (sfDir, outDir, only) = args match {
      case Array(a, b)    => (a, b, Option.empty[Set[String]])
      case Array(a, b, f) => (a, b, Some(f.split(",").toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // rank windows over already-limited (<= topK) frames are
    // single-partition by design; WindowExec's no-partition warning is
    // noise for them (and a literal partition key gets optimizer-folded)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    new java.io.File(outDir).mkdirs()
    // Gate outputs must be scalar-only: the driver's pandas canonicalizer
    // sort_values() throws `unhashable type: numpy.ndarray` on any
    // array/map/struct column (r5 shipped q_embed_centroid/q_embed_quant
    // red exactly this way). Fail fast HERE, at build time, instead.
    val nonScalar = scala.collection.mutable.ArrayBuffer[String]()
    val failed = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val bad = df.schema.fields.filter(f => f.dataType match {
          case _: org.apache.spark.sql.types.ArrayType
             | _: org.apache.spark.sql.types.MapType
             | _: org.apache.spark.sql.types.StructType => true
          case _ => false
        })
        if (bad.nonEmpty) {
          nonScalar += name
          System.err.println(s"[verify] $name emits non-scalar gate columns " +
            s"${bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ")} " +
            "— the driver cannot canonicalize these; posexplode to scalar rows")
        } else
          df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        // a thrown query produces no dump dir — track it and exit nonzero
        // below (it used to be stderr-only, so a broken query silently
        // vanished from the compare instead of failing it)
        failed += name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    if (nonScalar.nonEmpty) {
      System.err.println(s"[verify] ${nonScalar.size} quer(ies) with non-scalar " +
        s"output schemas: ${nonScalar.mkString(", ")} — fix before shipping")
      sys.exit(2)
    }
    if (failed.nonEmpty) {
      // exit AFTER every dump + oracle_sql.json landed, so the artifacts
      // for the queries that did build remain comparable
      System.err.println(s"[verify] ${failed.size} quer(ies) THREW during " +
        s"build/write: ${failed.mkString(", ")} — fix before shipping")
      sys.exit(3)
    }
  }
}
