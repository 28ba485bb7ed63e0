package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature: `sig[i] = min over set elements of
  * xxhash64_seed(i)(element)` for i in [0, numHashes).
  *
  * The declarative formulation
  * (`transform(sequence(0,k-1), i -> array_min(transform(set, s -> xxhash64(i, s))))`)
  * allocates k intermediate arrays per row through interpreted
  * higher-order lambdas; this expression is two primitive loops over the
  * element bytes. Evaluated once per document (not per pair), so
  * interpreted eval (CodegenFallback) is sufficient — the per-row cost is
  * the k·|set| hashing itself.
  *
  * Candidate generation downstream is exact-verified (Jaccard on full
  * sets), so the hash family only affects LSH recall, not results.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      var i = 0
      while (i < numHashes) {
        val h = XxHash64Function.hash(s, StringType, i.toLong)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashSignature {
  def minhash(set: Column, numHashes: Int): Column =
    ExpressionUtils.column(MinHashSignature(ExpressionUtils.expression(set), numHashes))
}
