package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.IntervalJoin

class IntervalJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // planted intervals: overlapping, nested, adjacent, empty, null
  private def intervals = Seq(
    (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")), // base hour
    (2L, ts("2024-01-01 00:30:00"), ts("2024-01-01 02:00:00")), // overlaps 1
    (3L, ts("2024-01-01 00:40:00"), ts("2024-01-01 00:50:00")), // nested in 1+2
    (4L, ts("2024-01-01 01:00:00"), ts("2024-01-01 01:30:00")), // adjacent to 1
    (5L, ts("2024-01-01 03:00:00"), ts("2024-01-01 03:00:00")), // empty: matches nothing
    (6L, null.asInstanceOf[Timestamp], ts("2024-01-01 04:00:00")) // null lo: dropped
  ).toDF("iid", "lo", "hi")

  private def probes = Seq(
    (10L, ts("2024-01-01 00:45:00")), // in 1, 2, 3
    (11L, ts("2024-01-01 01:00:00")), // half-open: NOT in 1; in 2 and 4
    (12L, ts("2024-01-01 02:30:00")), // in nothing
    (13L, ts("2024-01-01 03:00:00")), // empty interval 5 must not match
    (14L, null.asInstanceOf[Timestamp]) // null probe matches nothing
  ).toDF("pid", "pts")

  test("matches planted edge cases: overlap, nesting, half-open boundary, empty, nulls") {
    val got = IntervalJoin.join(probes, intervals, "pts", "lo", "hi")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 1L), (10L, 2L), (10L, 3L), (11L, 2L), (11L, 4L)))
  }

  test("equals the built-in nested-loop formulation on real data (events x islands)") {
    val ev = Tables.events(spark, sf).select(col("event_id"), col("ts"))
    val isl = Tables.events(spark, sf)
      .select(date_trunc("minute", col("ts")).as("m")).distinct()
      .select(col("m").as("lo"), (col("m") + expr("INTERVAL 1 MINUTE")).as("hi"))
    val custom = IntervalJoin.join(ev, isl, "ts", "lo", "hi")
      .select("event_id", "lo").as[(Long, Timestamp)].collect().toSet
    val nlj = ev.join(isl, col("ts") >= col("lo") && col("ts") < col("hi"))
      .select("event_id", "lo").as[(Long, Timestamp)].collect().toSet
    assert(custom == nlj && custom.nonEmpty)
  }

  test("plans as IntervalJoinExec (no BroadcastNestedLoopJoin), probe side not collected") {
    val df = IntervalJoin.join(probes, intervals, "pts", "lo", "hi")
    val execs = df.queryExecution.executedPlan.collect {
      case e: graft.plans.IntervalJoinExec => e
    }
    assert(execs.nonEmpty)
    assert(!df.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    // the same query through the built-in planner IS a nested loop — the
    // operator exists precisely because there is no equality key to hash on
    val builtin = probes.join(intervals, col("pts") >= col("lo") && col("pts") < col("hi"))
    assert(builtin.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
  }

  test("GraftExtensions injects the interval-join planner strategy") {
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(e)
    assert(org.apache.spark.sql.graft.PlanBridge.plannerStrategies(e, spark)
      .contains(graft.plans.IntervalJoinStrategy))
  }

  test("works on plain integral keys too") {
    val bands = Seq(("low", 0L, 100L), ("mid", 100L, 500L), ("high", 500L, 1000L))
      .toDF("band", "lo", "hi")
    val vals = spark.range(0, 1000, 7).select(col("id"))
    val got = IntervalJoin.join(vals, bands, "id", "lo", "hi")
    assert(got.count() == vals.count()) // total cover, half-open: exactly one band each
    val perBand = got.groupBy("band").count().as[(String, Long)].collect().toMap
    assert(perBand("low") == vals.filter("id < 100").count())
    assert(perBand("high") == vals.filter("id >= 500").count())
  }

  test("shared-lineage sides (same exprIds) produce correct right columns") {
    // both sides derived from ONE frame carry the same AttributeReferences;
    // without the re-alias layer, UnsafeProjection bound the right-side
    // columns to the LEFT positions and emitted the probe row's values in
    // the interval columns (review finding)
    val base = spark.range(0, 10).select(col("id"),
      (col("id") * 100).as("lo"), (col("id") * 100 + 50).as("hi"))
    val probesSide = base.select(col("id").as("pid"), (col("id") * 100 + 10).as("pv"))
    val got = IntervalJoin.join(probesSide, base.select("id", "lo", "hi"),
      "pv", "lo", "hi")
    val rows = got.orderBy("pid").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (pid, pv) = (r.getLong(0), r.getLong(1))
      val (iid, lo, hi) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(iid == pid && lo == pid * 100 && hi == pid * 100 + 50,
        s"interval columns carry wrong values: $r")
      assert(pv == pid * 100 + 10)
    }
  }

  test("mixed date/timestamp keys are rejected at construction, not mis-joined") {
    // Date is days-since-epoch, Timestamp micros — raw comparison would
    // silently join in different units
    val iv = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")))
      .toDF("iid", "lo", "hi")
    val dprobes = Seq(Tuple1(java.sql.Date.valueOf("2024-01-01"))).toDF("d")
    val e = intercept[IllegalArgumentException] {
      IntervalJoin.join(dprobes, iv, "d", "lo", "hi")
    }
    assert(e.getMessage.contains("interval join needs"), e.getMessage)
  }

  test("column resolution falls back case-insensitively, like the session resolver") {
    val bands = Seq(("a", 0L, 10L)).toDF("band", "lo", "hi")
    val vals = Seq(Tuple1(5L)).toDF("id")
    assert(IntervalJoin.join(vals, bands, "ID", "LO", "Hi").count() == 1)
  }
}
