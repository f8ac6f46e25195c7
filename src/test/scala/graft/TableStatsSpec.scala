package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TableStats

/** ANALYZE-style column statistics (ops/TableStats.scala): the oracle gate
  * proves the orders stats against DuckDB; this spec proves null
  * accounting, the approx path, and the one-pass plan shape. */
class TableStatsSpec extends AnyFunSuite {
  import TestSpark._

  test("stats on a frame with nulls: n_nulls and ndv are exact") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("a")), (5L, None)
    ).toDF("k", "v")
    val got = TableStats.analyze(df, Seq("k", "v")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))).toMap
    assert(got("k") == ((5L, 0L, 5L, "1", "5")))
    assert(got("v") == ((5L, 2L, 2L, "a", "b")))
  }

  test("exact stats match direct aggregates on orders") {
    val o = Tables.orders(spark, sf)
    val got = TableStats.analyze(o, Seq("o_orderkey", "o_orderstatus"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val wantKeys = o.select(countDistinct("o_orderkey")).head().getLong(0)
    val wantStatus = o.select(countDistinct("o_orderstatus")).head().getLong(0)
    assert(got("o_orderkey") == wantKeys && got("o_orderstatus") == wantStatus)
  }

  test("the approx path returns HLL estimates within its error envelope") {
    val o = Tables.orders(spark, sf)
    val exact = o.select(countDistinct("o_orderkey")).head().getLong(0)
    val approx = TableStats.analyze(o, Seq("o_orderkey"), exact = false)
      .collect().head.getLong(3)
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"approx NDV $approx vs exact $exact")
  }

  test("the exact plan is ONE aggregate pass (Expand, no join, no extra exchange stages)") {
    val plan = TableStats.analyze(Tables.orders(spark, sf),
      Seq("o_orderkey", "o_custkey", "o_orderstatus"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "stats must not join")
    assert(plan.contains("Expand"), "multi-distinct should plan via Expand")
  }
}
