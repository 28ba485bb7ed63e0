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
  * result-identical in every case: exact shape above, float arrays,
  * literal 0.0 seed, identity finish. Both sides accumulate
  * `double(a[i])*double(b[i])` left to right, both yield NULL for
  * unequal-length inputs, and both yield NULL when any element is NULL
  * ([[FloatVectorDot]] checks element nulls explicitly, matching the
  * fold's NULL propagation — so the rewrite is safe on parquet-sourced
  * arrays, which always read as `containsNull = true`).
  *
  * Inject with `spark.experimental.extraOptimizations` (live session) or
  * [[GraftExtensions]] (`spark.sql.extensions` conf).
  */
object RewriteVectorDot extends Rule[LogicalPlan] {

  // Any float array qualifies: FloatVectorDot propagates NULL elements
  // exactly like the declarative fold (explicit isNullAt checks), so
  // containsNull=true (every parquet-sourced array) is safe to rewrite.
  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
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
