package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions
import graft.ops.TokenOps

class MisraGriesSpec extends AnyFunSuite {
  import TestSpark._

  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int): Set[String] = {
    GraftFunctions.register(spark)
    df.agg(call_function("misra_gries", col("v"), lit(k)).as("cands"))
      .head().getSeq[String](0).toSet
  }

  test("MG guarantee: items above n/(k+1) always survive, size stays <= k") {
    import spark.implicits._
    // planted zipf-ish stream: "hot" 400/1000, "warm" 200/1000, rest unique
    val rows = Seq.fill(400)("hot") ++ Seq.fill(200)("warm") ++
      (0 until 400).map(i => s"u$i")
    // distribute across many partitions to force partial-buffer merges
    val df = rows.toDF("v").repartition(16)
    val k = 5
    val cands = sketch(df, k)
    assert(cands.size <= k)
    // n/(k+1) = 1000/6 ≈ 167 — hot and warm are both guaranteed present
    assert(cands.contains("hot") && cands.contains("warm"))
  }

  test("MG candidates are partitioning-independent after exact re-count") {
    import spark.implicits._
    val rows = Seq.fill(300)("a") ++ Seq.fill(150)("b") ++
      (0 until 550).map(i => s"x${i % 97}")
    def exactHH(parts: Int): Set[(String, Long)] = {
      val df = rows.toDF("v").repartition(parts)
      val cands = sketch(df, 20)
      val n = rows.size.toLong
      df.filter(col("v").isInCollection(cands))
        .groupBy("v").agg(count(lit(1)).as("c"))
        .filter(col("c") * 10 > n) // 10% threshold >> n/(k+1)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    }
    // the sketch itself may differ by merge order; the thresholded exact
    // re-count may not
    assert(exactHH(1) == exactHH(16))
    assert(exactHH(16) == Set(("a", 300L), ("b", 150L)))
  }

  test("heavy_hitters query equals the full groupBy-HAVING ground truth") {
    val ours = TokenOps.heavyHitters(spark, sf)
    val truth = {
      val tok = Tables.documents(spark, sf)
        .select(explode(split(col("text"), " ")).as("tok"))
      val n = tok.count()
      tok.groupBy("tok").agg(count(lit(1)).as("n_occur"))
        .filter(col("n_occur") * 100 > n)
        .select(col("tok"), col("n_occur"))
        .orderBy(desc("n_occur"), col("tok"))
    }
    assert(ours.collect().toSeq == truth.collect().toSeq)
    assert(ours.count() > 0) // the corpus genuinely has >1% tokens
  }
}
