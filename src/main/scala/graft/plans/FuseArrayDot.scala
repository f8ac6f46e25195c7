package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression, LambdaFunction, Literal, Multiply, NamedExpression, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.ArrayDot

/** Optimizer rule: rewrite the built-in higher-order-function dot product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v) }}}
  *
  * into the fused, codegen'd [[graft.functions.ArrayDot]]. The HOF chain
  * materializes the intermediate product array and interprets a lambda per
  * element, and it breaks whole-stage codegen; the fused loop was measured
  * ~20× faster on the all-pairs cosine workload. Users can keep writing
  * the declarative built-in form — the rule injects the fast kernel, the
  * same way Catalyst's own rewrites work.
  *
  * Semantics-preserving by construction: ArrayDot returns null on length
  * mismatch (zip_with null-pads) and on null elements, exactly like the
  * HOF chain. The match is deliberately narrow — only a literal 0.0 zero,
  * a pure x*y zip lambda over exactly the two zip variables, a pure
  * acc+v merge lambda, and an identity finish qualify.
  *
  * Registered via [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule`) or ad hoc through
  * `spark.experimental.extraOptimizations`. */
object FuseArrayDot extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _                        => false
  }

  private def sameVars(used: Seq[Expression], declared: Seq[NamedExpression]): Boolean =
    used.length == declared.length &&
      declared.forall(d => used.exists(_.semanticEquals(d))) &&
      used.forall(u => declared.exists(u.semanticEquals(_)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(Multiply(mx, my, _), zipVars, _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(ax, ay, _), mergeVars, _),
          LambdaFunction(finishBody, Seq(finishVar), _))
        if isDoubleArray(a) && isDoubleArray(b) &&
          sameVars(Seq(mx, my), zipVars) &&
          sameVars(Seq(ax, ay), mergeVars) &&
          finishBody.semanticEquals(finishVar) =>
      ArrayDot(a, b)
  }
}
