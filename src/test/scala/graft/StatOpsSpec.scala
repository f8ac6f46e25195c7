package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{ChangeOps, StatOps}
import graft.ops.TokenOps

class StatOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("range frame: rolling 30-day spend equals a hand-built self-join window") {
    val r = StatOps.windowRangeFrame(spark, sf).cache()
    // oracle by construction: sum of cents over the explicit day interval
    val o = r.select("o_custkey", "o_orderkey", "day", "cents")
    val a = o.toDF("ck", "ok", "d", "c")
    val b = o.toDF("ck2", "ok2", "d2", "c2")
    val viaJoin = a.join(b,
        a("ck") === b("ck2") && b("d2").between(a("d") - 29, a("d")))
      .groupBy("ck", "ok").agg(sum("c2").as("expect"))
    val bad = r.join(viaJoin,
        r("o_custkey") === viaJoin("ck") && r("o_orderkey") === viaJoin("ok"))
      .filter(col("spend_30d_cents") =!= col("expect"))
    assert(bad.count() == 0)
    // every row's rolling sum includes at least its own order
    assert(r.filter(col("spend_30d_cents") < col("cents")).count() == 0)
    r.unpersist()
  }

  test("ntile deciles: counts balanced within 1 and deciles cover 1..10") {
    val r = StatOps.ntileDeciles(spark, sf).cache()
    val byStatus = r.groupBy("o_orderstatus")
      .agg(min("n").as("lo"), max("n").as("hi"),
        countDistinct("decile").as("nd"),
        min("decile").as("dmin"), max("decile").as("dmax"))
      .collect()
    byStatus.foreach { row =>
      assert(row.getAs[Long]("hi") - row.getAs[Long]("lo") <= 1) // equi-depth
      assert(row.getAs[Long]("nd") == 10 &&
        row.getAs[Long]("dmin") == 1 && row.getAs[Long]("dmax") == 10)
    }
    // decile value ranges must not overlap: max(cents) of decile k <= min of k+1
    import spark.implicits._
    val ordered = r.orderBy("o_orderstatus", "decile")
      .select("o_orderstatus", "min_cents", "max_cents").as[(String, Long, Long)]
      .collect().groupBy(_._1)
    ordered.values.foreach { rows =>
      rows.sliding(2).foreach {
        case Array(lo, hi) => assert(lo._3 <= hi._2)
        case _             =>
      }
    }
    r.unpersist()
  }

  test("z-score outliers: bounded by Chebyshev and never exceed group size") {
    val r = StatOps.outlierZscore(spark, sf).collect()
    r.foreach { row =>
      val n = row.getAs[Long]("n"); val out = row.getAs[Long]("n_outliers")
      assert(out <= n)
      // Chebyshev: P(|X-mu| > 2 sigma) <= 1/4 for the SAMPLE itself the
      // bound is slightly looser; allow 30% as a sanity ceiling
      assert(out.toDouble / n <= 0.30)
      assert(row.getAs[Double]("sd") >= 0.0)
    }
  }

  test("embedding covariance: diagonal positive, symmetric triangle complete") {
    val r = StatOps.embeddingCovariance(spark, sf).cache()
    val dim = 64
    assert(r.count() == dim.toLong * (dim + 1) / 2) // full upper triangle
    // G[i][i] = sum of squares > 0 unless the whole column is zero
    assert(r.filter(col("i") === col("j")).filter(col("gram") <= 0).count() == 0)
    // spot-check one off-diagonal entry against a direct computation
    val direct = Tables.embeddings(spark, sf)
      .select(expr("CAST(floor(CAST(embedding[0] AS DOUBLE) * 1000) AS BIGINT)").as("q0"),
        expr("CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000) AS BIGINT)").as("q1"))
      .agg(sum(col("q0") * col("q1"))).head().getLong(0)
    val g01 = r.filter(col("i") === 0 && col("j") === 1).head().getAs[Long]("gram")
    assert(g01 == direct)
    r.unpersist()
  }

  test("span dedup: planted duplicate spans are detected, ppm bounded") {
    val r = TokenOps.spanDedup(spark, sf).cache()
    assert(r.filter(col("dup_ppm") > 1000000L).count() == 0)
    assert(r.filter(col("n_dup_spans") > col("n_spans")).count() == 0)
    // planted check: two synthetic docs sharing one exact 16-token span
    import spark.implicits._
    val span = (1 to 16).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, span + " extra unique tail one", "en", "s", 0L),
      (2L, span + " different unique tail two", "en", "s", 0L),
      (3L, "completely different words " + (1 to 13).map(i => s"only$i").mkString(" "), "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.createOrReplaceTempView("__span_docs")
    val spans = docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("n", size(col("ws")))
      .select(col("doc_id"), col("ws"),
        expr("explode(sequence(0L, (n - 1) div 16))").as("c"))
      .select(col("doc_id"),
        md5(concat_ws(" ", expr("slice(ws, CAST(c * 16 + 1 AS INT), 16)"))).as("h"))
    val dup = spans.groupBy("h").agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") >= 2)
    assert(dup.count() == 1) // exactly the planted shared span
    r.unpersist()
  }

  test("lm score: fluency is a valid mean of per-bigram ppm probabilities") {
    val r = TokenOps.lmScore(spark, sf).cache()
    // a probability ratio can never exceed 1 (1e6 ppm)
    assert(r.filter(col("fluency_ppm") > 1000000L).count() == 0)
    assert(r.filter(col("fluency_ppm") < 0L).count() == 0)
    // every scored doc has at least one bigram
    assert(r.filter(col("n_bigrams") < 1).count() == 0)
    // a doc made of one repeated bigram scores exactly 1e6 under its own LM:
    // sanity of the formula on a hand-computed corpus
    import spark.implicits._
    val docs = Seq((1L, "x y x y x y", "en", "t", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val ws = docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("ws"),
        expr("explode(sequence(1, size(ws) - 1))").as("i"))
      .select(col("doc_id"),
        expr("element_at(ws, i)").as("w1"),
        expr("element_at(ws, i + 1)").as("w2"))
    val uni = ws.groupBy("w1").agg(count(lit(1)).as("c1"))
    val bi = ws.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val lm = bi.join(uni, "w1").select(col("w1"), col("w2"),
      expr("c2 * 1000000L div c1").as("p_ppm"))
    val score = ws.join(lm, Seq("w1", "w2"))
      .agg(expr("sum(p_ppm) div count(1)")).head().getLong(0)
    // bigrams: (x,y)×3 → p=1.0; (y,x)×2 → p=1.0 ⇒ mean exactly 1e6
    assert(score == 1000000L)
    r.unpersist()
  }

  test("bpe train: planted corpus learns the dominant pair first") {
    val r = TokenOps.bpeTrain(spark, sf).cache()
    // trained vocab includes at least one multi-char (merged) token, and
    // merged tokens are concatenations that appeared adjacent in the corpus
    import spark.implicits._
    val merged = r.filter(length(col("tok")) >= 2).as[(String, Long)].collect()
    assert(merged.nonEmpty)
    // the corpus-wide most frequent adjacent pair must be among the merges
    val first = TokenOps.bpePairCounts(spark, sf).head().getString(0)
    assert(merged.map(_._1).contains(first))
    r.unpersist()
  }

  test("interval coverage: binned sweep equals brute-force day explosion") {
    import graft.queries.TemporalOps
    val r = TemporalOps.intervalCoverage(spark, sf).cache()
    // brute force: explode every interval into its covered days, count
    // distinct (prio, day) — the definition of union length
    val brute = Tables.orders(spark, sf).select(
        col("o_orderpriority").as("prio"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("long").as("st"),
        (datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("long")
          + lit(5L) + col("o_orderkey") % 20L).as("en"))
      .select(col("prio"), expr("explode(sequence(st, en - 1))").as("day"))
      .groupBy("prio").agg(countDistinct("day").as("expect"))
    val bad = r.join(brute, "prio")
      .filter(col("covered_days") =!= col("expect"))
    assert(bad.count() == 0)
    // the sweep never produces more covered time than total interval length
    val totalLen = Tables.orders(spark, sf)
      .agg(sum(lit(5L) + col("o_orderkey") % 20L)).head().getLong(0)
    val covered = r.agg(sum("covered_days")).head().getLong(0)
    assert(covered <= totalLen && covered > 0)
    r.unpersist()
  }

  test("schema evolution: merged read surfaces NULLs for the late column") {
    import graft.queries.ExtraOps
    val r = ExtraOps.schemaEvolution(spark, sf).collect()
    assert(r.length == 2)
    val v1 = r.find(_.getAs[Int]("v") == 1).get
    val v2 = r.find(_.getAs[Int]("v") == 2).get
    assert(v1.getAs[Long]("n_with_bal") == 0) // v1 lacks the evolved column
    assert(v2.getAs[Long]("n_with_bal") == v2.getAs[Long]("n"))
    assert(v1.isNullAt(v1.fieldIndex("bal_cents")))
  }

  test("map ops: map totals reconcile with a plain per-nation count") {
    import graft.queries.ExtraOps
    val r = ExtraOps.mapOps(spark, sf).cache()
    val direct = Tables.customer(spark, sf)
      .join(Tables.nation(spark, sf), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name").agg(count(lit(1)).as("expect"))
    assert(r.join(direct, "n_name")
      .filter(col("n_customers") =!= col("expect")).count() == 0)
    // keys in the concat are sorted, so segments string is lexicographic
    import spark.implicits._
    r.select("segments").as[String].collect().foreach { sgs =>
      val ks = sgs.split(",")
      assert(ks.sameElements(ks.sorted))
    }
    r.unpersist()
  }

  test("dq checks: clean constraints report zero, tight range reports violations") {
    import graft.queries.ProfileOps
    val r = ProfileOps.dqChecks(spark, sf).collect()
      .map(row => row.getString(0) -> (row.getLong(1), row.getLong(2))).toMap
    assert(r.size == 5)
    // the data is referentially clean and fully populated
    assert(r("not_null_shipdate")._2 == 0)
    assert(r("fk_orderkey")._2 == 0)
    // a REAL finding: the synthetic lineitem reuses (orderkey, linenumber)
    // pairs — the uniqueness rule must report exactly the duplicate count
    val li = Tables.lineitem(spark, sf)
    val dups = li.count() -
      li.select("l_orderkey", "l_linenumber").distinct().count()
    assert(dups > 0 && r("unique_line")._2 == dups)
    // the deliberately tight quantity bound must catch real rows
    assert(r("range_quantity_le40")._2 > 0)
    // every rule checked the full table
    val n = Tables.lineitem(spark, sf).count()
    r.values.foreach { case (checked, _) => assert(checked == n) }
  }

  test("dq checks: the column rules + uniqueness share ONE scan of the fact") {
    import graft.queries.ProfileOps
    // the r4 plan aggregated lineitem once per rule (5 scans); at 100 TB
    // that is five reads of the fact — the combined pass must show exactly
    // one lineitem scan, and the full query (rules + FK join) exactly two
    // string form: AQE wraps the physical plan, hiding scan nodes from
    // a tree collect until execution; toString prints the initial plan
    def lineitemScans(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.toString.linesIterator
        .count(l => l.contains("FileScan") && l.contains("lineitem"))
    assert(lineitemScans(ProfileOps.dqColumnRules(spark, sf)) == 1)
    assert(lineitemScans(ProfileOps.dqChecks(spark, sf)) == 2)
  }

  test("column profiler plans with NO Expand (sketch pass, not multi-distinct replay)") {
    import graft.queries.ProfileOps
    // the r5 profiler's multiple count_distinct aggregates planned through
    // an Expand that replayed every orders row ~|cols|+1×; the rebuilt
    // profiler is one HLL-sketch aggregate + one keyed single-distinct —
    // neither may reintroduce an Expand node anywhere in the tree
    val plan = ProfileOps.profileOrders(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"profiler plan regressed to Expand:\n$plan")
  }

  test("rolling active users equals a brute-force trailing-window count") {
    import graft.queries.BehaviorOps
    val r = BehaviorOps.rollingActiveUsers(spark, sf).cache()
    val ev = Tables.events(spark, sf)
      .select(datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("d"),
        col("user_id").as("u")).distinct().cache()
    // brute force: for each output day D, distinct users active in [D-6, D]
    val days = r.select(col("day")).distinct()
    val brute = days.join(ev, col("d").between(col("day") - 6, col("day")))
      .groupBy("day").agg(countDistinct("u").as("expect"))
    assert(r.join(brute, "day").filter(col("wau") =!= col("expect")).count() == 0)
    // the WAU curve is bounded by total distinct users
    val totalUsers = ev.select("u").distinct().count()
    assert(r.agg(max("wau")).head().getLong(0) <= totalUsers)
    ev.unpersist(); r.unpersist()
  }

  test("preagg join: the aggregate sits BELOW the orders join in the plan") {
    import graft.queries.ScaleOps
    val df = ScaleOps.preaggJoin(spark, sf)
    // the per-order aggregate is the only one keyed by l_orderkey — its
    // presence plus a join proves the aggregation runs BEFORE the join
    // (AQE wraps the tree, so assert on the rendered plan)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Join"), s"no join in plan:\n${plan.take(1500)}")
    assert("HashAggregate\\(keys=\\[l_orderkey".r.findFirstIn(plan).isDefined,
      s"no pre-join per-order aggregate found:\n${plan.take(1500)}")
  }

  test("dpp star scan: fact partitions are pruned by a dynamic subquery") {
    import graft.queries.PipelineOps
    val df = PipelineOps.dppStarScan(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the partitioned fact scan must carry a dynamicpruning expression on
    // sale_year — NOT read all year directories statically
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected dynamic partition pruning in plan:\n${plan.take(2000)}")
    // and the answer must equal the statically-filtered computation
    val viaStatic = {
      val fact = graft.pipeline.Medallion.factSales(spark, sf)
      fact.filter((col("date_sk") / 10000).cast("int") === 1995)
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(floor(price * 100) AS BIGINT)")).as("c")).head()
    }
    val got = df.head()
    assert(got.getLong(0) == viaStatic.getLong(0))
    assert(got.getLong(1) == viaStatic.getLong(1))
  }

  test("table diff buckets: mismatch set is exactly the planted-drift buckets") {
    import graft.queries.PipelineOps
    val r = PipelineOps.tableDiffBuckets(spark, sf).cache()
    // expected repair set: buckets containing a modified or dropped key
    import spark.implicits._
    val expected = Tables.customer(spark, sf)
      .filter(col("c_custkey") % 131 === 0 || col("c_custkey") % 173 === 0)
      .select((col("c_custkey") % 32).as("bucket")).distinct()
      .as[Long].collect().toSet
    val got = r.select("bucket").as[Long].collect().toSet
    assert(got == expected)
    // dropped rows show up as count deltas, modifications as digest-only deltas
    val modOnly = r.filter(col("base_n") === col("rep_n"))
    assert(modOnly.filter(col("base_digest") === col("rep_digest")).count() == 0)
    r.unpersist()
  }

  test("forget keys: cascade is consistent and strictly smaller than source") {
    val row = ChangeOps.forgetKeys(spark, sf).head()
    val nCust = Tables.customer(spark, sf).count()
    val nOrd = Tables.orders(spark, sf).count()
    val nLi = Tables.lineitem(spark, sf).count()
    assert(row.getAs[Long]("n_customers_kept") < nCust) // key 0 always deleted
    assert(row.getAs[Long]("n_orders_kept") <= nOrd)
    assert(row.getAs[Long]("n_lineitems_kept") <= nLi)
    // no kept lineitem may reference a deleted order
    val del = Tables.customer(spark, sf)
      .filter(col("c_custkey") % 97 === 0).select("c_custkey")
    val deadOrders = Tables.orders(spark, sf)
      .join(del, col("o_custkey") === col("c_custkey"), "left_semi")
    val keptViaCounts = nLi - Tables.lineitem(spark, sf)
      .join(deadOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .count()
    assert(row.getAs[Long]("n_lineitems_kept") == keptViaCounts)
  }

  test("KS drift: exact D vs brute-force ECDFs; planted shift fires, identity doesn't") {
    import spark.implicits._
    // planted: side 0 ~ values 1..50, side 1 shifted by +20 — must drift
    val shifted = ((1 to 200).map(i => (0L, (i % 50 + 1).toLong)) ++
      (1 to 200).map(i => (1L, (i % 50 + 21).toLong))).toDF("side", "v")
    val sRow = StatOps.driftKsFrom(shifted).head()
    assert(sRow.getAs[Boolean]("drift"), "shifted distribution must drift")
    // brute-force D on the planted data: max |ECDF_A - ECDF_B| over values
    val a = (1 to 200).map(i => (i % 50 + 1).toLong)
    val b = (1 to 200).map(i => (i % 50 + 21).toLong)
    val vals = (a ++ b).distinct.sorted
    val dBrute = vals.map { t =>
      math.abs(a.count(_ <= t).toLong * b.size - b.count(_ <= t).toLong * a.size)
    }.max
    assert(sRow.getAs[Long]("d_num") === dBrute)
    // identical samples: D = 0, no drift
    val same = ((1 to 100).map(i => (0L, (i % 7).toLong)) ++
      (1 to 100).map(i => (1L, (i % 7).toLong))).toDF("side", "v")
    val idRow = StatOps.driftKsFrom(same).head()
    assert(idRow.getAs[Long]("d_num") === 0L)
    assert(!idRow.getAs[Boolean]("drift"))
    // fixture run: even/odd sources are same-distributed — sane, finite stats
    val fx = StatOps.driftKs(spark, sf).head()
    assert(fx.getAs[Long]("n_a") > 0 && fx.getAs[Long]("n_b") > 0)
    assert(fx.getAs[Double]("d") >= 0.0 && fx.getAs[Double]("d") <= 1.0)
  }

  test("ols trend: slope and intercept match a sequential least-squares fit") {
    val got = StatOps.olsTrend(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // sequential recomputation from the same monthly cells
    val monthly = Tables.orders(spark, sf)
      .select(col("o_orderstatus"),
        ((year(to_date(col("o_orderdate"))) - 1992) * 12 +
          month(to_date(col("o_orderdate"))) - 1).cast("long").as("x"),
        expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"))
      .groupBy("o_orderstatus", "x").agg(sum("cents").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    monthly.foreach { case (st, cells) =>
      val xs = cells.map(_._2.toDouble); val ys = cells.map(_._3.toDouble)
      val n = xs.size.toDouble
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val icept = (sy - slope * sx) / n
      val (nm, gs, gi) = got(st)
      assert(nm === cells.size.toLong)
      assert(math.abs(gs - slope) < 1e-2, s"$st slope $gs vs $slope")
      assert(math.abs(gi - icept) < 1.0, s"$st intercept $gi vs $icept")
    }
  }

  test("corr matrix: bounded, matches the builtin estimator, finds the price-qty link") {
    val r = StatOps.corrMatrix(spark, sf).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getDouble(2)).toMap
    assert(r.size == 6)
    r.values.foreach(c => assert(c >= -1.0 && c <= 1.0))
    // (the synthetic generator draws the numerics independently — near-zero
    // correlations are the honest expectation here; the agreement check
    // below is the real assertion)
    // the exact-moment formula must agree with Spark's builtin corr()
    // (float-summed, so only to ~1e-3) on every pair
    r.foreach { case ((a, b), c) =>
      val builtin = Tables.lineitem(spark, sf)
        .agg(corr(col(s"l_$a"), col(s"l_$b"))).head().getDouble(0)
      assert(math.abs(c - builtin) < 1e-3, s"$a~$b: $c vs builtin $builtin")
    }
  }

  test("corr matrix plan: exactly one scan of lineitem feeds all 15 moments") {
    val plan = StatOps.corrMatrix(spark, sf).queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("lineitem"))
    assert(scans === 1, s"expected a single lineitem scan, got $scans")
  }

  test("chi2 drift: hand-computed statistic; planted mix shift fires, identity is zero") {
    import spark.implicits._
    // planted: side 0 is 100a/100b, side 1 is 180a/20b — strong drift
    val shifted = (Seq.fill(100)((0L, "a")) ++ Seq.fill(100)((0L, "b")) ++
      Seq.fill(180)((1L, "a")) ++ Seq.fill(20)((1L, "b"))).toDF("side", "cat")
    val sRow = StatOps.driftChi2From(shifted).head()
    assert(sRow.getAs[Boolean]("drift"))
    assert(sRow.getAs[Long]("dof") === 1L)
    // sequential χ²: cells o, e = rt*ct/N over the 2×2 table
    val cells = Map((0, "a") -> 100.0, (0, "b") -> 100.0,
      (1, "a") -> 180.0, (1, "b") -> 20.0)
    val n = cells.values.sum
    val chi2 = cells.map { case ((s, c), o) =>
      val rt = cells.collect { case ((`s`, _), v) => v }.sum
      val ct = cells.collect { case ((_, `c`), v) => v }.sum
      val e = rt * ct / n
      (o - e) * (o - e) / e
    }.sum
    assert(math.abs(sRow.getAs[Long]("chi2_q9") / 1e9 - chi2) < 1e-6,
      s"chi2 ${sRow.getAs[Long]("chi2_q9") / 1e9} vs sequential $chi2")
    // identical mixes: statistic exactly zero, no drift
    val same = (Seq.fill(50)((0L, "a")) ++ Seq.fill(30)((0L, "b")) ++
      Seq.fill(50)((1L, "a")) ++ Seq.fill(30)((1L, "b"))).toDF("side", "cat")
    val idRow = StatOps.driftChi2From(same).head()
    assert(idRow.getAs[Long]("chi2_q9") === 0L)
    assert(!idRow.getAs[Boolean]("drift"))
    // ZERO-OBSERVED cell: 'b' absent from side 1 entirely — the (1,'b')
    // cell still contributes (0−e)²/e = e; dropping it (the original
    // observed-cells-only formulation) computed 41.67 instead of 66.67
    val zero = (Seq.fill(50)((0L, "a")) ++ Seq.fill(50)((0L, "b")) ++
      Seq.fill(100)((1L, "a"))).toDF("side", "cat")
    val zRow = StatOps.driftChi2From(zero).head()
    val zCells = Map((0, "a") -> 50.0, (0, "b") -> 50.0,
      (1, "a") -> 100.0, (1, "b") -> 0.0)
    val zn = zCells.values.sum
    val zChi2 = zCells.map { case ((s2, c2), o) =>
      val rt = zCells.collect { case ((`s2`, _), v) => v }.sum
      val ct = zCells.collect { case ((_, `c2`), v) => v }.sum
      val e = rt * ct / zn
      (o - e) * (o - e) / e
    }.sum
    assert(math.abs(zRow.getAs[Long]("chi2_q9") / 1e9 - zChi2) < 1e-6,
      s"zero-cell chi2 ${zRow.getAs[Long]("chi2_q9") / 1e9} vs sequential $zChi2")
    assert(zRow.getAs[Boolean]("drift"))
  }
}
