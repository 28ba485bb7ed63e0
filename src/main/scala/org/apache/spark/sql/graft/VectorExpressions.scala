// Placed under org.apache.spark.sql to reach the private[sql] bridge
// (ExpressionUtils.column) and AbstractDataType — the standard extension
// technique for shipping custom Catalyst expressions outside Spark.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

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
