package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TopK
import graft.queries.RelOps

class TopKSpec extends AnyFunSuite {
  import TestSpark._

  test("aggregator top-k equals the window formulation row for row") {
    val agg = TopK.topPartsPerSupplier(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val win = RelOps.windowRankPerGroup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(agg.sameElements(win))
  }

  test("aggregator top-k runs with map-side partial aggregation, not a window sort") {
    val plan = TopK.topPartsPerSupplier(spark, sf).queryExecution.executedPlan.toString
    // the bounded buffer must aggregate partially BEFORE the group shuffle...
    assert(plan.contains("partial_topkagg"),
      s"no map-side partial top-k in plan:\n$plan")
    // ...and no Window operator anywhere (the whole point is avoiding the
    // per-group full sort)
    assert(!plan.contains("Window"), s"window operator crept in:\n$plan")
  }

  test("lateral top-k equals a window formulation and decorrelates") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val lat = graft.queries.ExtraOps.lateralTopk(spark, sf)
    // independent formulation: rank window over the same join
    val w = Window.partitionBy("n_name")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val viaWindow = Tables.customer(spark, sf)
      .join(Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .select("n_name", "c_name", "c_acctbal")
    assert(lat.exceptAll(viaWindow).count() == 0)
    assert(viaWindow.exceptAll(lat).count() == 0)
    // the correlated LIMIT must decorrelate — no per-outer-row re-scan shape
    val plan = lat.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"lateral did not decorrelate:\n${plan.take(1500)}")
  }
}
