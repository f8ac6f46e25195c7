package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{GraphOps, Similarity}

class GraphOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("pagerank covers every vector, conserves bounded mass, rewards in-links") {
    val pr = GraphOps.pagerank(spark, sf).cache()
    val n = Tables.embeddings(spark, sf).count()
    assert(pr.count() == n)
    val base = (1000000L * 15 / 100) / n
    // every node gets at least the teleport base; floor division only
    // loses mass, so the total never exceeds the initial 10^6 micro-units
    assert(pr.filter(col("rank_micro") < base).count() == 0)
    val total = pr.agg(sum("rank_micro")).head().getLong(0)
    assert(total <= 1000000L + n, s"mass grew: $total")
    assert(total >= base * n)
    // nodes with no in-edges sit exactly at the base; any node above it
    // must have an in-edge in the 3-NN graph
    val edges = Similarity.knnGraph(spark, sf, 3).select(col("vec_b").as("vec_id")).distinct()
    val above = pr.filter(col("rank_micro") > base)
    assert(above.join(edges, Seq("vec_id"), "left_anti").count() == 0)
    pr.unpersist()
  }
}
