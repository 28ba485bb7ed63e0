// Placed under org.apache.spark.sql to reach the private[sql] bridge
// (ExpressionUtils.column) and AbstractDataType — the standard extension
// technique for shipping custom Catalyst expressions outside Spark.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, LongType}

/** Custom Catalyst expressions for the vector hot path.
  *
  * The declarative formulation (`aggregate(zip_with(a,b,*),0,+)`) is
  * correct but allocates an intermediate array per row and evaluates the
  * lambda interpreted — at N² near-dup pair volume that dominates the
  * query. [[FloatVectorDot]] generates a tight primitive loop instead
  * (whole-stage-codegen'd), summing `double(a[i])*double(b[i])` left to
  * right — bit-identical to the sequential fold it replaces, so results
  * (and the DuckDB oracle compare) are unchanged.
  */
object VectorExpressions {
  /** Dot product of two `array<float>` columns as double. */
  def dotF(a: Column, b: Column): Column =
    ExpressionUtils.column(
      FloatVectorDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** All banded sign-LSH buckets of a vector in one pass:
    * `array<long>` of length `bands`, element b = the band's bucket id
    * (bit r = sign(v · plane_{b·bandBits+r})). See [[RadSignBuckets]]. */
  def radBuckets(v: Column, bands: Int, bandBits: Int, dim: Int): Column =
    ExpressionUtils.column(
      RadSignBuckets(ExpressionUtils.expression(v), bands, bandBits, dim))

  /** Deterministic Rademacher plane component sign: true (+1) iff the top
    * bit of md5("p_d") is set — portable to any engine with md5
    * (DuckDB: `('0x' || substr(md5(p || '_' || d), 1, 1))::INT >= 8`). */
  def radPositive(p: Int, d: Int): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${p}_${d}".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (md(0) & 0x80) != 0
  }
}

case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // Unequal-length inputs yield NULL (see below), so the expression is
  // nullable even over non-nullable children.
  override def nullable: Boolean = true

  // NULL semantics match the declarative form exactly, in both cases:
  //  - length mismatch → NULL (zip_with null-pads the shorter array, the
  //    multiply produces NULL, the fold's `acc + NULL` nulls the sum);
  //  - any NULL element → NULL (the element's product is NULL and the
  //    fold nulls from there on) — checked per element, so the rewrite
  //    rule is safe on parquet arrays, which always read containsNull=true.
  // Equal lengths, no nulls: both sides accumulate
  // double(a[i])*double(b[i]) left to right — bit-identical.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (ys.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      acc += xs.getFloat(i).toDouble * ys.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All `bands` sign-LSH band buckets of a float vector in ONE expression.
  *
  * The naive formulation — `bands × bandBits` separate dot products, each
  * against a `dim`-element literal plane array — works, but its generated
  * code carries bands·bandBits·dim literal floats: Janino compilation of
  * that method became the dominant cost of the whole near-dup query
  * (measured ~6 s of a ~7 s query at sf0.1, on BOTH sides of the
  * self-join). Here the planes are precomputed once on the driver and
  * shipped as a single object reference (`ctx.addReferenceObj`), and all
  * bands·bandBits projections run in one tight loop per row.
  *
  * Parity contract (must match the DuckDB oracle, which recomputes every
  * bit): plane component = [[VectorExpressions.radPositive]]; projection
  * accumulates ±double(v[d]) left-to-right; bit r of band b is set iff
  * the projection with plane `b·bandBits + r` is ≥ 0. A NULL element or
  * a length-mismatched input yields bit 0 for the affected planes (the
  * CASE-over-NULL behavior of the declarative form).
  */
case class RadSignBuckets(child: Expression, bands: Int, bandBits: Int, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(bands > 0 && bandBits > 0 && bandBits <= 63 && dim > 0)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // planes(p)(d): precomputed ±1 signs, one flat object reference.
  @transient private lazy val planes: Array[Array[Boolean]] =
    Array.tabulate(bands * bandBits)(p =>
      Array.tabulate(dim)(d => VectorExpressions.radPositive(p, d)))

  def computeBuckets(xs: ArrayData): Array[Long] = {
    val out = new Array[Long](bands)
    if (xs.numElements() == dim) {
      var b = 0
      while (b < bands) {
        var bucket = 0L
        var r = 0
        while (r < bandBits) {
          val pl = planes(b * bandBits + r)
          var acc = 0.0
          var anyNull = false
          var d = 0
          while (d < dim) {
            if (xs.isNullAt(d)) anyNull = true
            else {
              val vd = xs.getFloat(d).toDouble
              acc += (if (pl(d)) vd else -vd)
            }
            d += 1
          }
          if (!anyNull && acc >= 0) bucket |= (1L << r)
          r += 1
        }
        out(b) = bucket
        b += 1
      }
    }
    out
  }

  override def nullSafeEval(a: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      computeBuckets(a.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Ship the whole expression instance and call computeBuckets — the
    // per-row work is the loop itself; inlining it as Java source would
    // re-create the literal-bloat problem this expression exists to fix.
    val self = ctx.addReferenceObj("radSignBuckets", this)
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $self.computeBuckets($a));
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
