package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 26-bin a–z letter histogram of a string in ONE pass.
  *
  * Replaces the 26 × `length(t) - length(translate(t, ch, ''))` scalar
  * counts the char-entropy query used (each of which re-walks the whole
  * document): one loop over the UTF-8 bytes fills all bins. Counting
  * ASCII bytes 0x61–0x7a is exactly the per-code-point count the
  * translate form produces, because in UTF-8 an ASCII byte can only
  * occur as a standalone ASCII code point (continuation bytes all have
  * the high bit set).
  *
  * Fully codegen'd (inline byte loop), so downstream arithmetic over the
  * bins stays inside whole-stage codegen; the expression is deterministic,
  * so common-subexpression elimination evaluates it once per row even
  * when every bin is referenced separately.
  */
case class CharHistogram(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    val hist = new Array[Long](26)
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b >= 'a' && b <= 'z') hist(b - 'a') += 1
      i += 1
    }
    new GenericArrayData(hist)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val h = ctx.freshName("hist")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      s"""
         |long[] $h = new long[26];
         |int $n = $a.numBytes();
         |for (int $i = 0; $i < $n; $i++) {
         |  byte $b = $a.getByte($i);
         |  if ($b >= 97 && $b <= 122) $h[$b - 97]++;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($h);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharHistogram {
  /** `array<long>` of length 26: occurrences of 'a'..'z' in `c`. */
  def charHist(c: Column): Column =
    ExpressionUtils.column(CharHistogram(ExpressionUtils.expression(c)))
}
