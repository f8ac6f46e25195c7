package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{GraphOps, TopK}

class FrontierGraphSpec extends AnyFunSuite {
  import TestSpark._

  test("skyline equals the brute-force dominance anti-join") {
    val sky = TopK.skylineParts(spark, sf).cache()
    val pr = Tables.part(spark, sf).select(
      col("p_partkey"), col("p_size"),
      round(col("p_retailprice") * 100, 0).cast("long").as("price_c"))
    // brute force: x survives iff no y with strictly lower price AND
    // strictly higher size
    val dominated = pr.as("x").join(pr.as("y"),
      col("y.price_c") < col("x.price_c") && col("y.p_size") > col("x.p_size"),
      "left_semi")
    val brute = pr.exceptAll(dominated).select("p_partkey", "p_size", "price_c")
    assert(sky.count() == brute.count())
    assert(sky.exceptAll(brute).isEmpty && brute.exceptAll(sky).isEmpty)
    // frontier property: walking by ascending price, sizes of survivors
    // never decrease below an earlier survivor's size
    val rows = sky.orderBy("price_c", "p_partkey").collect()
    var best = Int.MinValue
    rows.foreach { r =>
      assert(r.getInt(1) >= best)
      best = math.max(best, r.getInt(1))
    }
    sky.unpersist()
  }

  test("triangle counting on a planted graph") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles) + a pendant edge (no extra triangle),
    // edges deliberately unordered/duplicated to exercise canonicalization
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (1L, 4L),
      (2L, 3L), (2L, 4L), (3L, 4L), (4L, 3L), (5L, 1L)).toDF("vec_a", "vec_b")
    val und = edges
      .select(least(col("vec_a"), col("vec_b")).as("u"),
        greatest(col("vec_a"), col("vec_b")).as("v")).distinct()
    val e1 = und.toDF("a", "b"); val e2 = und.toDF("b", "c"); val e3 = und.toDF("a", "c")
    val tri = e1.join(e2, "b").join(e3, Seq("a", "c")).count()
    assert(tri == 4L)
    // wedges of K4 + pendant: deg(1)=4,deg(2)=3,deg(3)=3,deg(4)=3,deg(5)=1
    // → 6+3+3+3+0 = 15; closure = 3·4/15 = 0.8
    val wedges = und.select(col("u").as("n")).unionAll(und.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("dg"))
      .agg(sum(expr("dg * (dg - 1) div 2"))).head().getLong(0)
    assert(wedges == 15L)
  }

  test("graph_triangles invariants on the real kNN graph") {
    val r = GraphOps.triangles(spark, sf).head()
    val (tri, edges, wedges, cc) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(edges > 0 && wedges > 0)
    // every triangle contains 3 wedges → 3·T ≤ W, so cc ≤ 1e6
    assert(3 * tri <= wedges)
    assert(cc == 3 * tri * 1000000L / wedges)
  }
}
