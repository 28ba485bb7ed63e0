package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named set of driver-verifiable queries plus their DuckDB oracles. */
trait QueryGroup {
  def queries: Map[String, (SparkSession, String) => DataFrame]

  /** DuckDB SQL per query name; omit names that aren't SQL-expressible
    * (the driver then records a rows-only check for them). */
  def oracles: Map[String, String]
}
