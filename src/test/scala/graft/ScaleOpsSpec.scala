package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ScaleOps

class ScaleOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed join plan has no Exchange on the join path") {
    val plan = ScaleOps.bucketedJoinPlan(spark, sf)
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0 || plan.contains("ShuffledHashJoin") || plan.contains("BroadcastHashJoin"),
      s"no join in plan:\n$plan")
    // with matching bucket counts neither scan needs a shuffle: the only
    // acceptable Exchange would be AFTER the aggregate, never below the join
    val belowJoin = plan.substring(joinIdx.max(0))
    assert(!belowJoin.contains("Exchange hashpartitioning(l_orderkey") &&
      !belowJoin.contains("Exchange hashpartitioning(o_orderkey"),
      s"join inputs are shuffled:\n$plan")
  }

  test("salted aggregation equals direct aggregation") {
    val salted = ScaleOps.saltedAgg(spark, sf).collect()
    val direct = Tables.orders(spark, sf)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("total_price"))
      .orderBy("o_orderpriority").collect()
    assert(salted.map(r => (r.getString(0), r.getLong(1))).sameElements(
      direct.map(r => (r.getString(0), r.getLong(1)))))
  }

  test("approx distinct is within the configured error of exact") {
    val approx = ScaleOps.approxDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.orders(spark, sf)
      .groupBy("o_orderpriority").agg(countDistinct("o_custkey").as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e < 0.1, s"$k: approx=$a exact=$e")
    }
  }
}
