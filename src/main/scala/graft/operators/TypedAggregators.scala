package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`s — the Dataset-API face of the reference's
  * hand-rolled reducers (SURVEY.md §2.10): compile-time-checked
  * alternatives to `groupBy().agg(...)` for case-class pipelines.
  */
object TypedAggregators {

  /** The reference's score-merge reducer (`query.py:85-88`): sum partial
    * scores per key, keep the first non-empty title. Buffer is a plain
    * tuple — mergeable, so Spark runs it partial+final like any builtin.
    */
  class ScoreMerge extends Aggregator[(String, Double), (String, Double), (String, Double)] {
    def zero: (String, Double) = ("", 0.0)
    def reduce(b: (String, Double), a: (String, Double)): (String, Double) =
      (if (b._1.nonEmpty) b._1 else a._1, b._2 + a._2)
    def merge(x: (String, Double), y: (String, Double)): (String, Double) =
      (if (x._1.nonEmpty) x._1 else y._1, x._2 + y._2)
    def finish(r: (String, Double)): (String, Double) = r
    def bufferEncoder: Encoder[(String, Double)] = Encoders.tuple(Encoders.STRING, Encoders.scalaDouble)
    def outputEncoder: Encoder[(String, Double)] = Encoders.tuple(Encoders.STRING, Encoders.scalaDouble)
  }

  /** K-minimum-values (KMV) distinct-count sketch: state is the k
    * smallest *distinct* hash values seen; with a hash uniform on
    * [0, 2^60), E[#distinct] ≈ (k-1)·2^60 / h_k. Mergeable (union + trim),
    * so Spark runs it partial+final like any builtin — bounded state per
    * group at any scale, unlike collect_set.
    *
    * Unlike HLL++ (`approx_count_distinct`), the whole sketch is
    * *portable*: fed with [[graft.dedup.Dedup.portableTokenHash]] the
    * estimate is bit-reproducible in any engine with md5 — which is what
    * lets q_kmv_distinct carry a value-for-value DuckDB oracle, while
    * q_sketch_distinct (HLL, engine-specific hash) is verified through a
    * bounds oracle (estimate within ±5% of exact) instead.
    */
  class KMinValues(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    private def trim(s: Seq[Long]): Seq[Long] = s.distinct.sorted.take(k)
    def zero: Seq[Long] = Nil
    def reduce(b: Seq[Long], a: Long): Seq[Long] =
      if (b.length == k && a >= b.last) b else trim(b :+ a)
    def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] = trim(x ++ y)
    def finish(r: Seq[Long]): Seq[Long] = r
    def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Exact bounded top-k smallest-cost entries per group — a mergeable
    * per-group heap (the generalized `takeOrdered`, `query.py:92`,
    * as a typed aggregate: state is k entries, not the group).
    */
  class TopK(k: Int) extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {
    private def trim(s: Seq[(Long, Double)]): Seq[(Long, Double)] =
      s.sortBy(e => (-e._2, e._1)).take(k)
    def zero: Seq[(Long, Double)] = Nil
    def reduce(b: Seq[(Long, Double)], a: (Long, Double)): Seq[(Long, Double)] = trim(b :+ a)
    def merge(x: Seq[(Long, Double)], y: Seq[(Long, Double)]): Seq[(Long, Double)] = trim(x ++ y)
    def finish(r: Seq[(Long, Double)]): Seq[(Long, Double)] = r
    def bufferEncoder: Encoder[Seq[(Long, Double)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[Seq[(Long, Double)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
