package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Focused equivalence tests for the r18 optimization rewrites — each one
  * pins the restructured operator against the formulation it replaced (the
  * optimization rule: a restructure ships only with an equivalence proof).
  */
class R18OptimizationSpec extends AnyFunSuite {
  import TestSpark._

  // --- purchase_cadence: per-gap cumulative counts ≡ global exact rank ---

  test("purchase_cadence cum-count percentiles equal the global-rank formulation") {
    // the OLD shape, inline: global row_number over every (gap, custkey,
    // orderkey) — the partition-less fact-scale window r18 removed
    val w = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    val gaps = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
          .cast("long").as("day"))
      .withColumn("gap", col("day") - lag("day", 1).over(w))
      .filter(col("gap").isNotNull)
      .select(col("gap"), col("o_custkey"), col("o_orderkey"))
    val n = gaps.agg(count(lit(1)).as("n"),
      sum(when(col("gap") <= 30, 1L).otherwise(0L)).as("n_30"))
    val rw = Window.orderBy(col("gap"), col("o_custkey"), col("o_orderkey"))
    val old = gaps.withColumn("rn", row_number().over(rw).cast("long"))
      .crossJoin(broadcast(n))
      .groupBy("n", "n_30")
      .agg(
        min(when(col("rn") === expr("(n + 3) DIV 4"), col("gap"))).as("p25_gap_days"),
        min(when(col("rn") === expr("(n + 1) DIV 2"), col("gap"))).as("p50_gap_days"),
        min(when(col("rn") === expr("(9 * n + 9) DIV 10"), col("gap"))).as("p90_gap_days"))
      .select(col("n").as("n_gaps"),
        expr("n_30 * 1000000L DIV n").as("within_30d_ppm"),
        col("p25_gap_days"), col("p50_gap_days"), col("p90_gap_days"))
      .collect()
    val now = graft.queries.StatOps.purchaseCadence(spark, sf).collect()
    assert(now.sameElements(old),
      s"cum-count formulation diverged: ${now.toSeq} vs ${old.toSeq}")
  }

  // --- dsir: broadcast top-k threshold ≡ rank <= 100 ---

  test("dsir kept flag equals rank<=100 over the emitted scores (tie-exact boundary)") {
    val out = graft.ops.CorpusOps.dsirSample(spark, sf)
    val rw = Window.orderBy(desc("dsir_ppm"), col("doc_id"))
    val diverged = out
      .withColumn("kept_rank", row_number().over(rw) <= 100)
      .filter(col("kept") =!= col("kept_rank"))
      .count()
    assert(diverged == 0, s"$diverged docs where threshold-kept != rank-kept")
    val keptN = out.filter(col("kept")).count()
    val total = out.count()
    assert(keptN == math.min(100L, total), s"kept=$keptN of $total")
  }

  test("dsir threshold boundary is exact under score ties (synthetic)") {
    // replicate the kept expression on a frame engineered so the 100th and
    // 101st rows TIE on the score and only doc_id breaks the tie — the one
    // case a score-only threshold would get wrong
    graft.functions.GraftFunctions.register(spark)
    val scored = spark.range(0, 300).toDF("doc_id")
      .withColumn("dsir_ppm", when(col("doc_id") < 90, lit(1000L))
        .otherwise(lit(500L))) // ranks 91.. all tie at 500; boundary inside the tie run
    val thr = scored
      .agg(call_function("topk_min", -col("dsir_ppm"), col("doc_id"), lit(100)).as("top"))
      .select(get(col("top"), size(col("top")) - 1).as("t"))
    val kept = scored.crossJoin(broadcast(thr))
      .withColumn("kept",
        (col("dsir_ppm") > -col("t.dist")) ||
          (col("dsir_ppm") === -col("t.dist") && col("doc_id") <= col("t.id")))
    val rw = Window.orderBy(desc("dsir_ppm"), col("doc_id"))
    assert(kept.withColumn("kr", row_number().over(rw) <= 100)
      .filter(col("kept") =!= col("kr")).count() == 0)
    assert(kept.filter(col("kept")).count() == 100)
  }

  // --- baskets artifact parity ---

  test("stored basket artifact equals the direct lineitem aggregate") {
    val direct = Tables.lineitem(spark, sf)
      .groupBy("l_orderkey")
      .agg(sort_array(collect_set("l_partkey")).as("parts"))
      .orderBy("l_orderkey").collect()
    val stored = graft.queries.BehaviorOps.baskets(spark, sf)
      .orderBy("l_orderkey").collect()
    assert(stored.sameElements(direct))
  }

  // --- sparse top-k memo: hit and post-clear rebuild agree ---

  test("sparse_retrieval memo hit and post-clear rebuild return identical rows") {
    val first = graft.ops.TextOps.sparseRetrieval(spark, sf).collect()
    graft.util.SessionCaches.clear(spark)
    val rebuilt = graft.ops.TextOps.sparseRetrieval(spark, sf).collect()
    assert(rebuilt.sameElements(first))
  }
}
