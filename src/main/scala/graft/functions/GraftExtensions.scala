package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers the graft expression
  * library at session build time, so `spark.sql("SELECT array_dot(a,b)")`
  * works in any session built with
  * `.withExtensions(new GraftExtensions)` or started with
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
  * (Query functions also self-register via GraftFunctions.register, so the
  * driver harness works without the config; this is the deployment-grade
  * path.) */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    // one shared name → builder table with GraftFunctions.register — the
    // two registration paths can no longer drift
    GraftFunctions.defs.foreach { case (name, cls, builder) =>
      e.injectFunction((
        FunctionIdentifier(name), new ExpressionInfo(cls.getName, name), builder))
    }
    // declarative HOF dot products get the fused codegen kernel for free
    e.injectOptimizerRule(_ => graft.plans.FuseArrayDot)
    // partial-aggregation pushdown through provably-unique equi-joins
    e.injectOptimizerRule(_ => graft.plans.PushAggThroughUniqueJoin)
    // whole-operator extension: broadcast interval join (logical node +
    // strategy + physical plan; see graft.plans.IntervalJoin)
    e.injectPlannerStrategy(_ => graft.plans.IntervalJoinStrategy)
  }
}
