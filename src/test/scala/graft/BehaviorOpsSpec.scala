package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.BehaviorOps

class BehaviorOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("copurchase pairs are ordered, unique, and support-bounded") {
    val r = BehaviorOps.copurchasePairs(spark, sf).cache()
    // canonical orientation: every pair strictly p1 < p2
    assert(r.filter(col("p1") >= col("p2")).count() == 0)
    // (p1, p2) is a key — no duplicate pairs after the aggregate
    assert(r.count() == r.select("p1", "p2").distinct().count())
    // support can never exceed the total order count
    val orders = Tables.lineitem(spark, sf).select("l_orderkey").distinct().count()
    assert(r.agg(max("n_orders")).head().getLong(0) <= orders)
    r.unpersist()
  }

  test("copurchase pair support matches a hand-counted self-join") {
    val viaJoin = {
      val p = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey").distinct()
      val a = p.toDF("ok", "p1"); val b = p.toDF("ok", "p2")
      a.join(b, a("ok") === b("ok") && col("p1") < col("p2"))
        .groupBy("p1", "p2").agg(count(lit(1)).as("n_orders"))
    }
    val ours = {
      // re-run the grouped expansion WITHOUT the top-100 cut for equivalence
      Tables.lineitem(spark, sf)
        .groupBy("l_orderkey")
        .agg(sort_array(collect_set("l_partkey")).as("parts"))
        .select(explode(expr(
          """flatten(transform(parts, (x, i) ->
            |  transform(slice(parts, i + 2, size(parts)),
            |            y -> struct(x AS p1, y AS p2))))""".stripMargin)).as("pr"))
        .select(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
        .groupBy("p1", "p2").agg(count(lit(1)).as("n_orders"))
    }
    assert(ours.exceptAll(viaJoin).isEmpty && viaJoin.exceptAll(ours).isEmpty)
  }

  test("cohort retention: offset-0 row equals cohort size, counts monotone-safe") {
    val r = BehaviorOps.cohortRetention(spark, sf).cache()
    // every cohort has its week-0 row and no negative offsets
    assert(r.filter(col("week_offset") < 0).count() == 0)
    val cohorts = r.select("cohort_wk").distinct().count()
    assert(r.filter(col("week_offset") === 0).count() == cohorts)
    // retained users at any offset never exceed the cohort's week-0 size
    val w0 = r.filter(col("week_offset") === 0)
      .select(col("cohort_wk"), col("n_users").as("size0"))
    assert(r.join(w0, "cohort_wk").filter(col("n_users") > col("size0")).count() == 0)
    // total distinct users across cohorts equals distinct users in events
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(r.filter(col("week_offset") === 0).agg(sum("n_users")).head().getLong(0) == users)
    r.unpersist()
  }

  test("event transitions: row totals match event counts minus per-user lasts") {
    val r = BehaviorOps.eventTransitions(spark, sf).cache()
    val events = Tables.events(spark, sf).count()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    // every non-terminal event contributes exactly one transition
    assert(r.agg(sum("n_trans")).head().getLong(0) == events - users)
    // ppm shares per source row sum to ~1e6 (floor division loses < |targets|)
    val byFrom = r.groupBy("from_type").agg(sum("prob_ppm").as("ppm"), count(lit(1)).as("k"))
    assert(byFrom.filter(col("ppm") > 1000000L || col("ppm") <= lit(1000000L) - col("k")).count() == 0)
    r.unpersist()
  }
}
