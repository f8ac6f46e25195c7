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
    e.injectFunction((
      FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ArrayDot(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "misra_gries"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MisraGriesAgg(exprs.head,
          exprs(1).eval().asInstanceOf[Number].intValue())))
    def asInt(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
      e.eval().asInstanceOf[Number].intValue()
    e.injectFunction((
      FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "pq_encode"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PqEncode(exprs.head, exprs(1), asInt(exprs(2)), asInt(exprs(3)), asInt(exprs(4)))))
    e.injectFunction((
      FunctionIdentifier("pq_table"),
      new ExpressionInfo(classOf[PqTable].getName, "pq_table"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PqTable(exprs.head, exprs(1), asInt(exprs(2)), asInt(exprs(3)), asInt(exprs(4)))))
    e.injectFunction((
      FunctionIdentifier("pq_adc"),
      new ExpressionInfo(classOf[PqAdc].getName, "pq_adc"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PqAdc(exprs.head, exprs(1), asInt(exprs(2)), asInt(exprs(3)))))
    e.injectFunction((
      FunctionIdentifier("topk_min"),
      new ExpressionInfo(classOf[TopKMinAgg].getName, "topk_min"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TopKMinAgg(exprs.head, exprs(1),
          exprs(2).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((
      FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WordNgrams(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("rolling_hash_windows"),
      new ExpressionInfo(classOf[RollingHashWindows].getName, "rolling_hash_windows"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RollingHashWindows(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("rle_contains"),
      new ExpressionInfo(classOf[RleContains].getName, "rle_contains"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RleContains(exprs.head, exprs(1))))
    // declarative HOF dot products get the fused codegen kernel for free
    e.injectOptimizerRule(_ => graft.plans.FuseArrayDot)
    // partial-aggregation pushdown through provably-unique equi-joins
    e.injectOptimizerRule(_ => graft.plans.PushAggThroughUniqueJoin)
    // whole-operator extension: broadcast interval join (logical node +
    // strategy + physical plan; see graft.plans.IntervalJoin)
    e.injectPlannerStrategy(_ => graft.plans.IntervalJoinStrategy)
  }
}
