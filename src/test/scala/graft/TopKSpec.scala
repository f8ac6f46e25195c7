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
}
