package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ExtraOps

/** WITH RECURSIVE hierarchy traversal (SPARK-24497): the walk must agree
  * with a sequential recomputation of the derived tree (parent =
  * key DIV 10, roots below 10), the closure rollup must partition the
  * forest exactly, and the recursion must appear as an iterative loop
  * node in the physical plan (not an unrolled or collected shape). */
class RecursiveSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val keys: Seq[Long] =
    Tables.customer(spark, sf).select("c_custkey")
      .collect().map(_.getLong(0)).sorted.toSeq

  private def parent(k: Long): Long = k / 10

  private def chainToRoot(k: Long): List[Long] =
    if (k < 10) List(k) else k :: chainToRoot(parent(k))

  test("hierarchy walk matches a sequential recomputation") {
    val got = ExtraOps.recursiveHierarchy(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got.size === keys.size)
    keys.foreach { k =>
      val chain = chainToRoot(k).reverse // root .. k
      val (root, depth, path) = got(k)
      assert(root === chain.head, s"root of $k")
      assert(depth === (chain.size - 1).toLong, s"depth of $k")
      assert(path === chain.mkString("/"), s"path of $k")
    }
  }

  test("subtree rollup partitions the forest and respects leaf identities") {
    val roll = ExtraOps.recursiveSubtreeRollup(spark, sf).cache()
    val bySize = roll.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // every node is in exactly one root subtree: root sizes partition n
    val rootSum = (0L until 10L).map(k => bySize(k)._1).sum
    assert(rootSum === keys.size.toLong)
    // leaves (no key has them as parent) have subtree of exactly themselves
    val parents = keys.map(parent).toSet
    val leaves = keys.filterNot(parents.contains).take(20)
    leaves.foreach { k => assert(bySize(k) === ((1L, 0L)), s"leaf $k") }
    // a mid node's subtree size equals the sequential count of descendants
    val mid = keys.find(k => k >= 10 && parents.contains(k))
    mid.foreach { m =>
      val expected = keys.count(k => chainToRoot(k).contains(m)).toLong
      assert(bySize(m)._1 === expected, s"subtree of $m")
    }
    roll.unpersist()
  }

  test("recursion plans as an iterative loop, not a collected unroll") {
    val plan = ExtraOps.recursiveHierarchy(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("loop") || plan.contains("CTERecursion"),
      s"no recursion loop node in plan:\n${plan.take(2000)}")
  }
}
