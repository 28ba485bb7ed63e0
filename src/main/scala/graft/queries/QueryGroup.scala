package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named set of driver-verifiable queries plus their DuckDB oracles. */
trait QueryGroup {
  def queries: Map[String, (SparkSession, String) => DataFrame]

  /** DuckDB SQL per query name; omit names that aren't SQL-expressible
    * (the driver then records a rows-only check for them). */
  def oracles: Map[String, String]
}

object QueryGroup {
  /** Scratch directory for queries that exercise a write→read lifecycle
    * (JSONL roundtrip, index store, DSv2 connector). Registered for
    * recursive deletion at JVM exit so repeated Bench/Verify runs don't
    * accumulate unbounded copies under /tmp. */
  def scratchDir(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(dir)))
    dir.toString
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    import java.util.Comparator
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => try Files.deleteIfExists(f) catch { case _: java.io.IOException => () })
      finally walk.close()
    }
  }
}
