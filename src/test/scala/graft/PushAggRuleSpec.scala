package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.PushAggThroughUniqueJoin
import graft.queries.ScaleOps

/** Contracts of [[graft.plans.PushAggThroughUniqueJoin]] beyond the
  * differential gate's value equality: the rewrite actually FIRES (an
  * Aggregate lands below the join), it produces the same rows as the
  * rule-disabled plan, and it stays its hand when the uniqueness proof
  * is absent or the aggregate is not pushable.
  */
class PushAggRuleSpec extends AnyFunSuite {
  import TestSpark._

  private def joins(p: LogicalPlan) = p.collect { case j: Join => j }

  test("rule fires on the demo query: pre-aggregate sits below the join") {
    val df = ScaleOps.autoPreaggJoin(spark, sf)
    val opt = df.queryExecution.optimizedPlan
    val j = joins(opt)
    assert(j.nonEmpty, "no join in optimized plan")
    val leftAggs = j.head.left.collect { case a: Aggregate => a }
    assert(leftAggs.nonEmpty,
      s"expected a pushed-down Aggregate below the join; got:\n$opt")
  }

  test("rewritten plan equals the rule-disabled plan row for row") {
    PushAggThroughUniqueJoin.ensure(spark)
    val withRule = ScaleOps.autoPreaggJoin(spark, sf).collect()
    val prior = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations =
        prior.filterNot(_ eq PushAggThroughUniqueJoin)
      val dim = Tables.orders(spark, sf).groupBy("o_orderkey")
        .agg(max("o_custkey").as("custkey"))
      val without = Tables.lineitem(spark, sf)
        .select(col("l_orderkey"),
          expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").as("cents"))
        .join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy("custkey")
        .agg(sum("cents").as("revenue_cents"), count(lit(1)).as("n_lines"),
          max("cents").as("max_line_cents"))
        .orderBy("custkey").collect()
      assert(withRule.sameElements(without))
    } finally spark.experimental.extraOptimizations = prior
  }

  test("rule-on equals rule-off on random fact/dim shapes (15 trials)") {
    import spark.implicits._
    val rng = new scala.util.Random(0x9a7b)
    PushAggThroughUniqueJoin.ensure(spark)
    (1 to 15).foreach { trial =>
      val nFact = 1 + rng.nextInt(200)
      val nKeys = 1 + rng.nextInt(20)
      // negative values, duplicate keys, keys with no dim match, dim
      // keys with no fact rows — the edges a pushdown can get wrong
      val fact = (0 until nFact).map { _ =>
        (rng.nextInt(nKeys + 5).toLong, rng.nextLong() % 1000L,
          rng.nextInt(50).toLong)
      }.toDF("fk", "x", "y").repartition(3)
      val dimRaw = (0 until nKeys).flatMap { k =>
        (0 to rng.nextInt(3)).map(_ => (k.toLong, rng.nextInt(4).toLong))
      }.toDF("k", "grp").repartition(2)
      def q(): Array[org.apache.spark.sql.Row] = {
        val dim = dimRaw.groupBy("k").agg(max("grp").as("grp"))
        fact.join(dim, col("fk") === col("k"))
          .groupBy("grp")
          .agg(sum("x").as("sx"), count(lit(1)).as("n"),
            min("y").as("mn"), max("x").as("mx"))
          .orderBy("grp").collect()
      }
      val withRule = q()
      val prior = spark.experimental.extraOptimizations
      val without = try {
        spark.experimental.extraOptimizations =
          prior.filterNot(_ eq PushAggThroughUniqueJoin)
        q()
      } finally spark.experimental.extraOptimizations = prior
      assert(withRule.sameElements(without),
        s"trial $trial diverged (nFact=$nFact nKeys=$nKeys):\n" +
          s"  with:    ${withRule.mkString(", ")}\n" +
          s"  without: ${without.mkString(", ")}")
    }
  }

  test("global (ungrouped) aggregate over an EMPTY join: COUNT is 0, not NULL") {
    import spark.implicits._
    PushAggThroughUniqueJoin.ensure(spark)
    val fact = Seq((1L, 5L), (2L, -7L)).toDF("fk", "x")
    // dim key set is disjoint from the fact's → the inner join is empty,
    // the case where merging COUNT as a bare SUM returns NULL instead of 0
    val dimRaw = Seq((99L, 1L), (98L, 2L)).toDF("k", "g")
    def q(empty: Boolean) = {
      val dim = (if (empty) dimRaw else dimRaw.withColumn("k", col("k") - 98L + 1L))
        .groupBy("k").agg(max("g").as("g"))
      fact.join(dim, col("fk") === col("k"))
        .agg(count(lit(1)).as("n"), sum("x").as("sx"))
    }
    // rule fires on the global shape
    val opt = q(empty = true).queryExecution.optimizedPlan
    val j = joins(opt)
    assert(j.nonEmpty && j.head.left.collect { case a: Aggregate => a }.nonEmpty,
      s"rule did not fire on the ungrouped shape:\n$opt")
    // empty join: COUNT must be 0 (and SUM null) — the r9 advisor's bug
    val r = q(empty = true).collect()
    assert(r.length == 1 && r(0).getLong(0) == 0L && r(0).isNullAt(1),
      s"global agg over empty join: ${r.mkString}")
    // the rewritten COUNT attribute must stay non-nullable IN THE
    // OPTIMIZED plan (alias exprIds are preserved, so parents were
    // resolved against nullable=false — a bare SUM merge would flip it)
    assert(!opt.output.find(_.name == "n").get.nullable,
      s"rewritten count attribute became nullable:\n$opt")
    // non-empty sanity vs rule-off
    val withRule = q(empty = false).collect()
    val prior = spark.experimental.extraOptimizations
    val without = try {
      spark.experimental.extraOptimizations =
        prior.filterNot(_ eq PushAggThroughUniqueJoin)
      q(empty = false).collect()
    } finally spark.experimental.extraOptimizations = prior
    assert(withRule.sameElements(without))
  }

  test("multi-key equi-join: rule fires and matches rule-off (8 trials)") {
    import spark.implicits._
    val rng = new scala.util.Random(0x11ae)
    PushAggThroughUniqueJoin.ensure(spark)
    // the shipped naive-form query fires on the composite key
    val opt = ScaleOps.autoPreaggMultikey(spark, sf).queryExecution.optimizedPlan
    val j0 = joins(opt)
    assert(j0.nonEmpty && j0.head.left.collect { case a: Aggregate => a }.nonEmpty,
      s"rule did not fire on the multi-key naive form:\n$opt")
    (1 to 8).foreach { trial =>
      val nFact = 1 + rng.nextInt(150)
      val k1s = 1 + rng.nextInt(6)
      val k2s = 1 + rng.nextInt(6)
      val fact = (0 until nFact).map { _ =>
        (rng.nextInt(k1s + 2).toLong, rng.nextInt(k2s + 2).toLong,
          rng.nextLong() % 500L)
      }.toDF("f1", "f2", "x").repartition(3)
      val dimRaw = (0 until k1s).flatMap(a => (0 until k2s).map(b =>
        (a.toLong, b.toLong, rng.nextInt(3).toLong))).toDF("k1", "k2", "grp")
      def q(): Array[org.apache.spark.sql.Row] = {
        val dim = dimRaw.groupBy("k1", "k2").agg(max("grp").as("grp"))
        fact.join(dim, col("f1") === col("k1") && col("f2") === col("k2"))
          .groupBy("grp")
          .agg(sum("x").as("sx"), count(lit(1)).as("n"),
            avg("x").as("ax")) // exercises the sum+count partial split
          .orderBy("grp").collect()
      }
      val withRule = q()
      val prior = spark.experimental.extraOptimizations
      val without = try {
        spark.experimental.extraOptimizations =
          prior.filterNot(_ eq PushAggThroughUniqueJoin)
        q()
      } finally spark.experimental.extraOptimizations = prior
      assert(withRule.sameElements(without),
        s"multi-key trial $trial diverged:\n  with:    ${withRule.mkString(", ")}\n" +
          s"  without: ${without.mkString(", ")}")
    }
  }

  test("aliasing Project between aggregate and join is inlined, not a blocker") {
    import spark.implicits._
    PushAggThroughUniqueJoin.ensure(spark)
    val fact = Seq((1L, 5L), (1L, 7L), (2L, -3L), (3L, 10L)).toDF("fk", "x")
    val dimRaw = Seq((1L, 10L), (2L, 20L), (2L, 21L)).toDF("k", "g")
    val dim = dimRaw.groupBy("k").agg(max("g").as("g"))
    // the doubled column is a COMPUTED alias that lands in a Project
    // between the outer aggregate and the join — the pre-r11 rule only
    // looked through attribute-only projects
    val q = fact.join(dim, col("fk") === col("k"))
      .select(col("g"), (col("x") * 2).as("x2"))
      .groupBy("g").agg(sum("x2").as("sx2"), count(lit(1)).as("n"))
      .orderBy("g")
    val opt = q.queryExecution.optimizedPlan
    val j = joins(opt)
    assert(j.nonEmpty && j.head.left.collect { case a: Aggregate => a }.nonEmpty,
      s"rule did not fire through the aliasing Project:\n$opt")
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((10L, 24L, 2L), (21L, -6L, 1L)), got.mkString(", "))
  }

  test("avg over empty join merges to NULL like native Average") {
    import spark.implicits._
    PushAggThroughUniqueJoin.ensure(spark)
    val fact = Seq((1L, 5L), (2L, 9L)).toDF("fk", "x")
    val dim = Seq((99L, 1L), (98L, 2L)).toDF("k", "g")
      .groupBy("k").agg(max("g").as("g"))
    val q = fact.join(dim, col("fk") === col("k"))
      .agg(avg("x").as("ax"), count(lit(1)).as("n"))
    val opt = q.queryExecution.optimizedPlan
    val j = joins(opt)
    assert(j.nonEmpty && j.head.left.collect { case a: Aggregate => a }.nonEmpty,
      s"rule did not fire on the global avg shape:\n$opt")
    val r = q.collect()
    assert(r.length == 1 && r(0).isNullAt(0) && r(0).getLong(1) == 0L,
      s"avg over empty join: ${r.mkString}")
  }

  test("rule does NOT fire on a non-equi conjunct or a decimal avg") {
    import spark.implicits._
    PushAggThroughUniqueJoin.ensure(spark)
    val fact = Seq((1L, 5L, java.math.BigDecimal.valueOf(2.5)))
      .toDF("fk", "x", "dec")
    val dimRaw = Seq((1L, 3L), (2L, 9L)).toDF("k", "lim")
    val dim = dimRaw.groupBy("k").agg(max("lim").as("lim"))
    // equi + range conjunct: uniqueness holds but the condition is not a
    // pure conjunction of attribute equalities — must not fire
    val q1 = fact.join(dim, col("fk") === col("k") && col("x") > col("lim"))
      .groupBy("lim").agg(sum("x").as("sx"))
    val j1 = joins(q1.queryExecution.optimizedPlan)
    assert(j1.nonEmpty && j1.head.left.collect { case a: Aggregate => a }.isEmpty,
      "fired on a non-equi conjunct")
    // decimal AVG: two-level accumulation would change the result type
    val q2 = fact.join(dim, col("fk") === col("k"))
      .groupBy("lim").agg(avg("dec").as("ad"))
    val j2 = joins(q2.queryExecution.optimizedPlan)
    assert(j2.nonEmpty && j2.head.left.collect { case a: Aggregate => a }.isEmpty,
      "fired on a decimal avg")
  }

  test("rule does NOT fire on try_sum/try_avg (non-LEGACY eval modes)") {
    // `case f: Sum` also matches try_sum — Sum carrying EvalMode.TRY. A
    // TRY partial that overflows to NULL would be SKIPPED by the merge
    // Sum instead of nulling the whole group, so the rule must stay its
    // hand on anything but LEGACY (review finding; values + plan shape).
    import spark.implicits._
    PushAggThroughUniqueJoin.ensure(spark)
    val fact = Seq((1L, Long.MaxValue), (1L, Long.MaxValue), (2L, 7L))
      .toDF("fk", "x")
    val dim = Seq((1L, 10L), (2L, 20L)).toDF("k", "lim")
      .groupBy("k").agg(max("lim").as("lim"))
    val q = fact.join(dim, col("fk") === col("k"))
      .groupBy("lim").agg(expr("try_sum(x)").as("ts"), expr("try_avg(x)").as("ta"))
    val j = joins(q.queryExecution.optimizedPlan)
    assert(j.nonEmpty && j.head.left.collect { case a: Aggregate => a }.isEmpty,
      s"fired on try_sum/try_avg:\n${q.queryExecution.optimizedPlan}")
    // and the TRY semantics hold: the overflowing group nulls out
    val rows = q.orderBy("lim").collect()
    assert(rows(0).isNullAt(1), s"try_sum overflow must be NULL: ${rows.toSeq}")
    assert(rows(1).getLong(1) == 7L)
  }

  test("rule does NOT fire without the uniqueness proof or with distinct aggs") {
    PushAggThroughUniqueJoin.ensure(spark)
    // dim side is a raw table — unique in fact but not PROVABLY so
    val raw = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"),
        expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").as("cents"))
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey").agg(sum("cents").as("r"))
    val j1 = joins(raw.queryExecution.optimizedPlan)
    assert(j1.nonEmpty && j1.head.left.collect { case a: Aggregate => a }.isEmpty)
    // provably unique dim, but a DISTINCT aggregate — not pushable
    val dim = Tables.orders(spark, sf).groupBy("o_orderkey")
      .agg(max("o_custkey").as("custkey"))
    val dis = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"))
      .join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy("custkey").agg(countDistinct("l_partkey").as("nd"))
    val j2 = joins(dis.queryExecution.optimizedPlan)
    assert(j2.nonEmpty && j2.head.left.collect { case a: Aggregate => a }.isEmpty)
  }
}
