package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew-mitigation patterns for when AQE's runtime skew handling
  * isn't enough (e.g., a single key holding >1 executor's worth of rows,
  * or a skewed aggregation rather than a join).
  *
  * At 100 TB the first line of defense is AQE
  * (`spark.sql.adaptive.skewJoin.enabled`); these helpers cover the two
  * shapes AQE doesn't: skewed *aggregations* (two-phase salted groupBy)
  * and broadcast-incompatible skewed joins (salt + replicate).
  */
object Skew {

  /** Skew-proof count per key: pre-aggregate on (key, salt) — spreading a
    * hot key over `salt` reducers — then combine. Exact. */
  def saltedCount(df: DataFrame, keyCol: String, salt: Int = 16): DataFrame =
    df.withColumn("__salt", floor(rand(42) * salt).cast("int"))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as("n"))

  /** Salted equi-join: the big (skewed) side gets a random-but-seeded salt
    * in [0, salt); the small side is replicated `salt` times. Join output
    * is identical to the plain join — the salt only spreads hot keys over
    * `salt` tasks. Use when the small side is too big to broadcast but the
    * big side's key histogram is pathological.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salt: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      floor(rand(42) * salt).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
