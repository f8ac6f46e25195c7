package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsOf

class AsOfSpec extends AnyFunSuite {
  import TestSpark._

  test("asof join: no future right rows, unmatched left rows survive") {
    val r = AsOf.asofEvents(spark, sf).cache()
    // every match is point-in-time correct (view never after purchase)
    assert(r.filter(col("gap_us") < 0).count() == 0)
    // left-outer: purchases with no prior view keep nulls
    val total = Tables.events(spark, sf).filter(col("event_type") === "purchase").count()
    assert(r.count() == total)
    r.unpersist()
  }

  test("forward asof: next purchase at-or-after, brute-force equal") {
    val r = AsOf.asofEventsForward(spark, sf).cache()
    // point-in-time in the forward direction: never a PAST purchase
    assert(r.filter(col("lead_us") < 0).count() == 0)
    // left-outer on views
    val totalViews = Tables.events(spark, sf)
      .filter(col("event_type") === "view").count()
    assert(r.count() == totalViews)
    // brute force: min purchase_ts >= view_ts per (user, view), tie ->
    // smallest purchase_id
    val ev = Tables.events(spark, sf)
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("vid"), col("user_id").as("vu"), col("ts").as("vts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("pu"), col("ts").as("pts"))
    val brute = v.join(p, col("vu") === col("pu") && col("pts") >= col("vts"), "left")
      .groupBy("vid")
      .agg(min(struct(col("pts"), col("pid"))).as("best"))
      .select(col("vid"), col("best.pid").as("expect_pid"))
    val bad = r.join(brute, r("view_id") === brute("vid"))
      .filter(!(col("purchase_id") <=> col("expect_pid")))
    assert(bad.count() == 0)
    r.unpersist()
  }

  test("generic asofJoin picks the latest tie by rightOrd and stays left-outer") {
    import spark.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = Timestamp.valueOf("2024-01-01 00:01:00")
    val t2 = Timestamp.valueOf("2024-01-01 00:02:00")
    val left = Seq((1L, t1, "L1"), (1L, t2, "L2"), (2L, t0, "Lnone"))
      .toDF("k", "lts", "lname")
    val right = Seq((1L, t1, 10L, "A"), (1L, t1, 11L, "B"), (1L, t2, 12L, "C"))
      .toDF("k", "rts", "rid", "rval")
    val out = AsOf.asofJoin(left, right, "k", "lts", "rts", "rid", Seq("rid", "rval"))
      .orderBy("lname").collect()
    val byName = out.map(r => r.getString(2) -> r).toMap
    // L1 at t1: ties (A@10, B@11) → B wins (largest rid); same-ts inclusive
    assert(byName("L1").getString(4) == "B")
    // L2 at t2: latest is C
    assert(byName("L2").getString(4) == "C")
    // key 2 has no right rows at all → null carry
    assert(byName("Lnone").isNullAt(4))
  }

  test("asofJoin attaches the latest right ROW atomically, even when its carry field is null") {
    import spark.implicits._
    val t1 = Timestamp.valueOf("2024-01-01 00:01:00")
    val t2 = Timestamp.valueOf("2024-01-01 00:02:00")
    val t3 = Timestamp.valueOf("2024-01-01 00:03:00")
    val left = Seq((1L, t3, "L")).toDF("k", "lts", "lname")
    // older row has rval="A"; the LATEST row's rval is NULL — the output
    // must carry (rid=2, rval=NULL), not a stitched (rid=2, rval="A")
    val right = Seq((1L, t1, 1L, Some("A")), (1L, t2, 2L, None))
      .toDF("k", "rts", "rid", "rval")
    val out = AsOf.asofJoin(left, right, "k", "lts", "rts", "rid", Seq("rid", "rval"))
      .collect()
    assert(out.length == 1)
    assert(out(0).getLong(3) == 2L, "latest right row by ts must win")
    assert(out(0).isNullAt(4), "null carry field of the matched row must stay null")
  }
}
