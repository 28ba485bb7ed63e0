package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Deterministic, engine-portable sampling and dataset splitting — the
  * reproducibility primitives of a training-data pipeline. Instead of
  * RNG-based `sample()` (whose result depends on engine, partitioning
  * and seed plumbing), membership is a pure function of a salted
  * portable hash of a key column:
  *
  *   - the same row lands in the same sample/split on every run, every
  *     engine, any partitioning — append-only datasets keep their
  *     earlier assignments (critical for stable eval sets);
  *   - different salts give independent samples (domain separation);
  *   - the DuckDB oracle recomputes membership exactly — sampling
  *     becomes hash-verifiable, not just "roughly the right size".
  *
  * Scale: a scalar predicate/projection on the scan — no shuffle, no
  * state; fuses into whole-stage codegen.
  */
object Sampling {

  /** The portable hash is uniform on [0, 2^60) (15 md5 hex digits —
    * [[graft.dedup.Dedup.portableTokenHash]]). */
  val HashRange: Long = 1L << 60

  /** Salted portable hash of a key column (domain-separated by salt). */
  def saltedHash(salt: String, key: Column): Column =
    Dedup.portableTokenHash(concat(lit(salt + ":"), key.cast("string")))

  /** Keep rows whose salted hash falls below `frac` of the hash range —
    * a deterministic `frac`-sample keyed on `keyCol`. */
  def deterministicSample(df: DataFrame, keyCol: String, frac: Double,
                          salt: String = "sample"): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, s"frac must be in [0,1], got $frac")
    df.filter(saltedHash(salt, col(keyCol)) < lit((frac * HashRange).toLong))
  }

  /** Threshold for a cumulative weight — shared with the SQL oracle so
    * both engines compare against the identical long. */
  def cut(cumWeight: Double): Long = (cumWeight * HashRange).toLong

  /** Deterministic WEIGHTED sampling (Efraimidis–Spirakis A-ES with a
    * hash-derived uniform): each row gets priority `-ln(u) / weight`
    * where `u = (saltedHash + 1) / 2^60` ∈ (0, 1], and the k LOWEST
    * priorities form the sample — inclusion probability ∝ weight (e.g.
    * quality-score- or length-weighted corpus sampling), yet membership
    * is a pure function of the key, so the draw is reproducible,
    * append-stable and oracle-verifiable like every sampler here.
    *
    * Scale: the priority is a scalar expression on the scan; the global
    * top-k is TakeOrderedAndProject (each task ships only its local k).
    */
  def weightedPriority(keyCol: Column, weightCol: Column,
                       salt: String = "wsample"): Column = {
    val u = (saltedHash(salt, keyCol).cast("double") + lit(1.0)) /
      lit(HashRange.toDouble)
    -log(u) / weightCol.cast("double")
  }

  def weightedSample(df: DataFrame, keyCol: String, weightCol: String, k: Int,
                     salt: String = "wsample"): DataFrame =
    df.withColumn("priority", weightedPriority(col(keyCol), col(weightCol), salt))
      .orderBy(col("priority").asc, col(keyCol).asc)
      .limit(k)

  /** Append a `split` column assigning each row to one of the named
    * weighted partitions (e.g. train/val/test) by salted hash range —
    * exhaustive and disjoint by construction.
    *
    * Pass a GROUP key (user id, session, source document) instead of a
    * row key for a leakage-free grouped split: the hash is a pure
    * function of the key, so every row of a group lands in the same
    * split — no shuffle, no group materialization (q_group_split gates
    * this with an oracle-recomputed zero-leak count). */
  def assignSplit(df: DataFrame, keyCol: String, weights: Seq[(String, Double)],
                  salt: String = "split"): DataFrame = {
    require(weights.nonEmpty, "need at least one split")
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"weights must sum to 1, got ${weights.map(_._2).sum}")
    val h = saltedHash(salt, col(keyCol))
    val cum = weights.scanLeft(0.0)(_ + _._2).tail
    val expr = weights.init.zip(cum.init).reverse
      .foldLeft(lit(weights.last._1): Column) {
        case (acc, ((name, _), c)) => when(h < lit(cut(c)), lit(name)).otherwise(acc)
      }
    df.withColumn("split", expr)
  }

  /** Deterministic weight-based UPSAMPLING (replication) — the mixture
    * op the downsamplers can't express: upweighting rare domains in a
    * training mixture (w > 1 emits multiple copies). Each row of a
    * stratum with weight `w` is emitted `floor(w)` times plus one extra
    * copy when its salted hash falls below `frac(w)` of the hash range —
    * expected copies = w, and the replication set is a pure function of
    * the key (reproducible, append-stable, oracle-verifiable). Strata
    * without a weight are dropped (weight 1.0 keeps a stratum as-is).
    * Output gains a 1-based `copy` column so downstream
    * shuffling/packing treats copies as distinct rows.
    *
    * Scale: per-row sequence-explode on the scan, rows out ∝ Σ weights —
    * no shuffle, no state.
    */
  def upsample(df: DataFrame, keyCol: String, stratumCol: String,
               weights: Map[String, Double],
               salt: String = "upsample"): DataFrame = {
    require(weights.nonEmpty, "need at least one stratum weight")
    weights.values.foreach(w =>
      require(w >= 0.0, s"weights must be non-negative, got $w"))
    val base = weights.foldLeft(lit(-1L): Column) {
      case (acc, (stratum, w)) =>
        when(col(stratumCol) === stratum, lit(math.floor(w).toLong)).otherwise(acc)
    }
    val fracCut = weights.foldLeft(lit(0L): Column) {
      case (acc, (stratum, w)) =>
        when(col(stratumCol) === stratum, lit(cut(w - math.floor(w)))).otherwise(acc)
    }
    val extra = when(saltedHash(salt, col(keyCol)) < fracCut, 1L).otherwise(0L)
    df.withColumn("__n_copies", when(base >= 0L, base + extra).otherwise(0L))
      .filter(col("__n_copies") >= 1L)
      .withColumn("copy", explode(sequence(lit(1L), col("__n_copies"))))
      .drop("__n_copies")
  }

  /** Temperature-based mixture resampling at α = 0.5: stratum shares are
    * flattened from p ∝ n toward uniform via p ∝ √n (the multilingual
    * mixing rule of mBERT/XLM-R — low-resource strata upweighted,
    * dominant ones sampled below 1), then realized as a deterministic
    * per-row copy count exactly like [[upsample]]: `floor(r)` copies
    * plus one more when the salted key hash clears the fractional cut.
    * The replication factor is `r_s = (√n_s / Σ√n) · (N / n_s)` — total
    * corpus size is preserved in expectation.
    *
    * Reproducibility contract: `√n` is rounded to 6 dp (sqrt is exactly
    * rounded in IEEE, so both engines see the same double) and Σ√n is
    * accumulated in DECIMAL — exact and order-independent, so `r_s` is
    * bit-identical on any engine under any partitioning, and the oracle
    * recomputes every copy count. (A general temperature α would need
    * `pow`, which is NOT exactly rounded — α is fixed at 0.5 to keep
    * the factors portable.)
    *
    * Scale: stratum counts are one partial-agg shuffle of the stratum
    * key; factors (one row per stratum) broadcast back; the copy
    * explode is per-row on the scan. No data-sized shuffle.
    */
  def temperatureResample(df: DataFrame, keyCol: String, stratumCol: String,
                          salt: String = "temp"): DataFrame = {
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__sq", round(sqrt(col("__n").cast("double")), 6))
    val tot = counts.agg(
      sum(col("__sq").cast("decimal(18,6)")).cast("double").as("__z"),
      sum(col("__n")).cast("double").as("__total"))
    val factors = counts.crossJoin(broadcast(tot))
      .select(col(stratumCol),
        ((col("__sq") / col("__z")) * (col("__total") / col("__n").cast("double"))).as("__r"))
    val fracCut = floor((col("__r") - floor(col("__r"))) * lit(HashRange.toDouble)).cast("long")
    df.join(broadcast(factors), stratumCol)
      .withColumn("__n_copies", floor(col("__r")).cast("long") +
        when(saltedHash(salt, col(keyCol)) < fracCut, 1L).otherwise(0L))
      .filter(col("__n_copies") >= 1L)
      .withColumn("copy", explode(sequence(lit(1L), col("__n_copies"))))
      .drop("__n_copies", "__r")
  }

  /** Stratified deterministic sampling: a different fraction per stratum
    * value (e.g. downsample the dominant language, keep the rest) — the
    * domain-balancing step of a training-data mixture. Rows whose stratum
    * has no entry in `fractions` are dropped. Same salted-hash membership
    * as [[deterministicSample]]: reproducible, append-stable, nested
    * across fractions, and a scalar predicate on the scan (zero shuffle).
    */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
                       fractions: Map[String, Double],
                       salt: String = "strat"): DataFrame = {
    require(fractions.nonEmpty, "need at least one stratum fraction")
    fractions.values.foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"fractions must be in [0,1], got $f"))
    val h = saltedHash(salt, col(keyCol))
    val thresh = fractions.foldLeft(lit(-1L): Column) {
      case (acc, (stratum, f)) =>
        when(col(stratumCol) === stratum, lit(cut(f))).otherwise(acc)
    }
    df.filter(h < thresh)
  }
}
