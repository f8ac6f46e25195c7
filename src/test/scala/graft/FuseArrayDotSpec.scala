package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FuseArrayDotSpec extends AnyFunSuite {
  import TestSpark._

  private def hofDot = aggregate(
    zip_with(col("v"), col("v"), _ * _), lit(0.0), _ + _).as("dot")

  test("the HOF dot-product pattern is rewritten to the fused array_dot kernel") {
    val base = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) v")
    // without the rule: the HOF chain survives optimization
    val plain = base.select(col("vec_id"), hofDot)
    assert(!plain.queryExecution.optimizedPlan.toString.contains("array_dot"))
    val expected = plain.orderBy("vec_id").collect().map(_.getDouble(1))

    spark.experimental.extraOptimizations = Seq(graft.plans.FuseArrayDot)
    try {
      val fused = base.select(col("vec_id"), hofDot)
      assert(fused.queryExecution.optimizedPlan.toString.contains("array_dot"),
        s"rule did not fire:\n${fused.queryExecution.optimizedPlan}")
      val got = fused.orderBy("vec_id").collect().map(_.getDouble(1))
      assert(got.sameElements(expected), "rewrite changed results")
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("the rule leaves non-matching aggregates alone") {
    spark.experimental.extraOptimizations = Seq(graft.plans.FuseArrayDot)
    try {
      val base = Tables.embeddings(spark, sf)
        .selectExpr("vec_id", "cast(embedding as array<double>) v")
      // different merge lambda (acc + 2*e) — must NOT be fused
      val other = base.selectExpr(
        "aggregate(zip_with(v, v, (x, y) -> x * y), cast(0.0 as double), (acc, e) -> acc + e + e) AS notdot")
      assert(!other.queryExecution.optimizedPlan.toString.contains("array_dot"))
      assert(other.limit(1).collect().nonEmpty)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("ArrayDot nulls on length mismatch, matching zip_with padding semantics") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)), (Seq(1.0, 2.0), Seq(3.0, 4.0)))
      .toDF("a", "b")
    val out = df.select(
      graft.functions.GraftFunctions.arrayDot(spark, col("a"), col("b")).as("fused"),
      aggregate(zip_with(col("a"), col("b"), _ * _), lit(0.0), _ + _).as("hof"))
      .collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null behavior diverged: $r")
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1))
    }
    assert(out(0).isNullAt(0), "length mismatch must null out")
  }
}
