package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrites the declarative sequential-fold dot product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  *               0.0, (acc, v) -> acc + v) }}}
  *
  * over two `array<float>` columns into the codegen'd [[FloatVectorDot]]
  * primitive loop — users write the idiomatic higher-order form and get
  * the fast expression automatically.
  *
  * The match is deliberately narrow so the rewrite is provably
  * result-identical in every case: exact shape above, float arrays with
  * `containsNull = false` (a null element propagates NULL declaratively
  * but reads as 0.0f through `ArrayData.getFloat`, so nullable-element
  * arrays are excluded), literal 0.0 seed, identity finish. Both sides
  * accumulate `double(a[i])*double(b[i])` left to right, and both yield
  * NULL for unequal-length inputs ([[FloatVectorDot]] nulls on length
  * mismatch just as `zip_with`'s null-padding nulls the fold).
  *
  * Inject with `spark.experimental.extraOptimizations` (live session) or
  * [[GraftExtensions]] (`spark.sql.extensions` conf).
  */
object RewriteVectorDot extends Rule[LogicalPlan] {

  // containsNull must be false: FloatVectorDot reads elements via
  // ArrayData.getFloat, which turns a NULL element into 0.0f, while the
  // declarative fold propagates NULL — only non-null-element arrays are
  // provably result-identical.
  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, false) => true
    case _ => false
  }

  private def isDoubleCastOf(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case Cast(child: NamedLambdaVariable, DoubleType, _, _) => child.exprId == v.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(mx, my, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(accRef: NamedLambdaVariable, vRef: NamedLambdaVariable, _),
            Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          LambdaFunction(finRef: NamedLambdaVariable, Seq(fin: NamedLambdaVariable), _))
        if isFloatArray(a) && isFloatArray(b) &&
          isDoubleCastOf(mx, x) && isDoubleCastOf(my, y) &&
          accRef.exprId == acc.exprId && vRef.exprId == v.exprId &&
          finRef.exprId == fin.exprId =>
      FloatVectorDot(a, b)
  }
}
