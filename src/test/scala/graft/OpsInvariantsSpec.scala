package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{ChangeOps, ProfileOps, ScaleOps, TemporalOps}

class OpsInvariantsSpec extends AnyFunSuite {
  import TestSpark._

  test("keyset pagination: the cursor predicate reaches the parquet scan as a pushed filter") {
    import graft.queries.RelOps
    val plan = RelOps.paginatedKeyset(spark, sf).queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(l =>
      l.contains("FileScan") && l.contains("part")).getOrElse("")
    // the whole Or-cursor must land in PushedFilters (min-max row-group
    // skipping at the source), not evaluate post-scan only
    assert(scanLine.contains("PushedFilters:") && scanLine.contains("Or("),
      s"cursor predicate not pushed: $scanLine")
    assert(scanLine.contains("p_retailprice"), s"price bound not pushed: $scanLine")
    // and the page is the same rows the offset formulation would reach:
    // keyset page = offset-pagination rows 21-30 iff the cursor is row 20's
    // (price, key) — here just assert the page is full and correctly ordered
    val rows = RelOps.paginatedKeyset(spark, sf).collect()
    assert(rows.length == 10)
    val cents = rows.map(_.getLong(2))
    assert(cents.sameElements(cents.sortBy(-_)), "page must be price-descending")
    assert(cents.head <= 150000L, "page starts at or below the cursor price")
  }

  test("substring dedup plan: rolling-hash Generate, digest joins, no cartesian") {
    val plan = graft.ops.SubstringDedup.substringPairs(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rolling_hash_windows"),
      "gram build must run through the custom O(n) generator")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "pairing must come from digest equi-joins only")
  }

  test("boilerplate strip plan: digest-keyed join back, no cartesian") {
    val plan = graft.ops.Boilerplate.boilerplateStrip(spark, sf)
      .queryExecution.executedPlan.toString
    // positive shape: segments are md5-digested and the template set
    // comes from a distinct-doc count joined back by digest
    assert(plan.contains("md5("), "segment digesting missing from plan")
    assert(plan.contains("count(distinct doc_id"),
      "per-(source, digest) distinct-doc count missing from plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("phash dedup: planted structures found, banded join plan has no cartesian") {
    val df = graft.ops.Multimodal.phashDedup(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bit_count"), "exact Hamming verify missing from plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "candidates must come from the banded equi-join, never all-pairs")
    val rows = df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    // planted structure 1: jitter-only docs of one group share the exact
    // fingerprint — docs 1 and 399 are both group 1 (id % 199), neither
    // perturbed (id % 4 != 0), so each must see >= 1 partner at Hamming 0
    assert(rows(1L)._1 >= 1 && rows(1L)._2 == 0, s"doc 1: ${rows(1L)}")
    assert(rows(399L)._1 >= 1 && rows(399L)._2 == 0, s"doc 399: ${rows(399L)}")
    // planted structure 2: a perturbed doc (id % 4 == 0) flips <= 2
    // gradient bits, so any partner it reports sits at Hamming <= 2
    rows.collect { case (id, (n, mh)) if n > 0 =>
      assert(mh >= 0 && mh <= 2, s"doc $id reported min_hamming $mh")
    }
    // global sanity: near-dups exist and no doc pairs with everything
    assert(rows.values.count(_._1 > 0) > rows.size / 4, "planted dups missing")
    assert(rows.values.forall(_._1 < rows.size / 4), "suspiciously dense pairing")
  }

  test("profiler on an EMPTY table still emits one row per column") {
    // the exact/melted side has zero rows on an empty table; the left
    // join must keep the sketch side's per-column rows (n_distinct = 0)
    val d = graft.util.TempDirs.scratch("graft_emptyprof").toString
    Tables.orders(spark, sf).limit(0)
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val rows = ProfileOps.profileOrders(spark, d).collect()
    assert(rows.length === Tables.orders(spark, sf).columns.length)
    assert(rows.forall(r => r.getLong(2) == 0L), "n_distinct must be 0")
    assert(rows.forall(r => r.getBoolean(3)), "0 ≈ 0 is within the bound")
  }

  test("scd1 upsert: updates overwrite, inserts append, untouched rows pass through") {
    val base = Tables.customer(spark, sf)
    val merged = ChangeOps.scd1Upsert(spark, sf).cache()
    val nBase = base.count()
    val nInserts = base.filter(col("c_custkey") % 13 === 0).count()
    assert(merged.count() == nBase + nInserts)
    assert(merged.filter(col("c_mktsegment") === "UPDATED").count() ==
      base.filter(col("c_custkey") % 7 === 0).count())
    assert(merged.filter(col("c_mktsegment") === "NEWSEG").count() == nInserts)
    merged.unpersist()
  }

  test("scd2 history: one current row per key, expired rows chain into their successor") {
    val hist = ChangeOps.scd2History(spark, sf).cache()
    // exactly one current (open-ended) row per key
    val perKey = hist.filter(col("is_current")).groupBy("c_custkey").count()
    assert(perKey.filter(col("count") =!= 1).count() == 0)
    // every expired row has a successor opening exactly when it closed
    val expired = hist.filter(!col("is_current"))
      .select(col("c_custkey").as("k"), col("valid_to"))
    val opened = hist.filter(col("is_current"))
      .select(col("c_custkey").as("k"), col("valid_from"))
    assert(expired.join(opened, Seq("k"))
      .filter(col("valid_to") =!= col("valid_from")).count() == 0)
    // expired ⇒ the key was in the change batch; history row count =
    // base + changed + inserted
    val base = Tables.customer(spark, sf)
    val nChanged = base.filter(col("c_custkey") % 7 === 0).count()
    val nInserted = base.filter(col("c_custkey") % 13 === 0).count()
    assert(hist.count() == base.count() + nChanged + nInserted)
    assert(hist.filter(!col("is_current")).count() == nChanged)
    hist.unpersist()
  }

  test("stratified sample: exactly K per stratum, deterministic across runs") {
    val s1 = ChangeOps.stratifiedSample(spark, sf).collect()
    val s2 = ChangeOps.stratifiedSample(spark, sf).collect()
    assert(s1.sameElements(s2))
    val perSeg = s1.groupBy(_.getString(0)).values.map(_.length)
    assert(perSeg.forall(_ == ChangeOps.SamplePerStratum))
  }

  test("column profiler: clean source has zero nulls and sane distincts") {
    val p = ProfileOps.profileOrders(spark, sf).collect()
    assert(p.length == Tables.orders(spark, sf).columns.length)
    assert(p.forall(_.getLong(1) == 0L), "orders testdata has no nulls")
    val nd = p.map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(nd("o_orderkey") == Tables.orders(spark, sf).count())
    // the HLL sketch must land within the error contract on every column
    assert(p.forall(_.getBoolean(3)), "approx_count_distinct out of 10% bound")
  }

  test("range join recovers each session's own event count") {
    val ranged = TemporalOps.rangeJoinSessions(spark, sf)
    val total = ranged.agg(sum("n_contained")).head().getLong(0)
    assert(total == Tables.events(spark, sf).count())
  }

  test("plan stats observability reads estimates without triggering a job") {
    val s = graft.ops.Observability.planStats(Tables.lineitem(spark, sf))
    assert(s.sizeBytes > 0)
    assert(graft.ops.Observability.describe("lineitem", Tables.lineitem(spark, sf))
      .contains("MB"))
  }

  test("salted agg and percentiles agree with exact recomputation") {
    val p = ScaleOps.percentiles(spark, sf).collect()
    assert(p.nonEmpty)
    p.foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(2), "p50 <= p90 per group")
    }
  }

  test("variant shred: tags partition the stream; VARIANT survives a parquet roundtrip") {
    import org.apache.spark.sql.functions._
    val r = graft.queries.PipelineOps.variantShred(spark, sf).collect()
    assert(r.map(_.getString(0)).sorted.toSeq === Seq("arr", "obj", "str"))
    assert(r.map(_.getLong(1)).sum === Tables.events(spark, sf).count())
    // each shape only yields its own fields
    r.foreach { row =>
      row.getString(0) match {
        case "obj" => assert(!row.isNullAt(2) && row.isNullAt(3) && row.getLong(4) == 0)
        case "arr" => assert(row.isNullAt(2) && !row.isNullAt(3) && row.getLong(4) == 0)
        case "str" => assert(row.isNullAt(2) && row.isNullAt(3) &&
          row.getLong(4) == row.getLong(1))
      }
    }
    // the binary VARIANT encoding must survive storage: write, read, re-shred
    // (deterministic row set via a key filter — two bare limit(100) reads
    // would not be guaranteed to pick the same rows)
    val dir = "/tmp/graft_variant_rt"
    val docs = Tables.events(spark, sf).filter(col("event_id") < 100)
      .select(col("event_id"), expr("parse_json(props)").as("v"))
    docs.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
      .select(col("event_id"), expr("variant_get(v, '$.k', 'long')").as("k"))
    val direct = Tables.events(spark, sf).filter(col("event_id") < 100)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
    assert(back.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(back).count() === 0)
  }

  test("pit join: every event matches exactly one version; current-only rewrites history") {
    val pit = ChangeOps.pitJoin(spark, sf).cache()
    // coverage identity: each event lands in exactly ONE validity interval
    val total = pit.agg(org.apache.spark.sql.functions.sum("n_events")).head().getLong(0)
    assert(total === Tables.events(spark, sf).count())
    // the wrong query — joining everything to the CURRENT version — must
    // disagree: changed users' pre-change events get reclassified
    val hist = ChangeOps.scd2History(spark, sf)
    val ev = Tables.events(spark, sf)
    val currentOnly = ev.join(hist.filter(col("is_current")),
        ev("user_id") === hist("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_events"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val pitBySeg = pit.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the fixture's events all PRECEDE the 2024-06-01 change, so PIT
    // attributes nothing to the post-change segment — while current-only
    // reclassifies every changed user's history into it
    assert(pitBySeg !== currentOnly, "PIT join must not equal history-rewrite")
    assert(!pitBySeg.contains("UPDATED"),
      "no event may attribute to a version that postdates it")
    assert(currentOnly.getOrElse("UPDATED", 0L) > 0L,
      "current-only must misattribute changed users' history")
    pit.unpersist()
  }

  test("twap: hand-built series integrates exactly; last/single events carry no time") {
    val twap = TemporalOps.twapPerUser(spark, sf).cache()
    // fixture invariants: den_s sums exactly the per-user first-to-last
    // span, and twap sits inside the user's [min, max] value envelope
    val ev = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.expr(
        "max(unix_micros(ts) div 1000000) - min(unix_micros(ts) div 1000000)").as("span"),
        org.apache.spark.sql.functions.min("value").as("lo"),
        org.apache.spark.sql.functions.max("value").as("hi"))
    val joined = twap.join(ev, "user_id").collect()
    joined.foreach { r =>
      assert(r.getAs[Long]("den_s") === r.getAs[Long]("span"), s"span of ${r.get(0)}")
      if (r.getAs[Long]("den_s") > 0) {
        val t = r.getAs[Double]("twap")
        // floor-quantization can undershoot min by at most 1e-6
        assert(t >= r.getAs[Double]("lo") - 1e-6 && t <= r.getAs[Double]("hi"),
          s"twap envelope of ${r.get(0)}")
      }
    }
    // planted: 10 held for 100s then 30 for 300s -> (10*100+30*300)/400 = 25,
    // NOT the plain AVG of 20; the closing event adds no weight
    import spark.implicits._
    // raw events store ts as epoch NANOS (Tables.events converts) — mimic
    val base = 1704067200L // 2024-01-01T00:00:00Z, seconds
    def at(secs: Long): Long = (base + secs) * 1000000000L
    val planted = Seq(
      (1L, at(0), 7L, "x", 10.0, "{}"),
      (2L, at(100), 7L, "x", 30.0, "{}"),
      (3L, at(400), 7L, "x", 999.0, "{}"), // closing event: value unused
      (4L, at(50), 8L, "x", 42.0, "{}")    // single event: no duration
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = "/tmp/graft_twap_spec" // twapPerUser reads only events
    planted.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = TemporalOps.twapPerUser(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(7L).getAs[Double]("twap") === 25.0)
    assert(got(7L).getAs[Long]("den_s") === 400L)
    assert(got(8L).getAs[Long]("den_s") === 0L)
    assert(got(8L).isNullAt(got(8L).fieldIndex("twap")))
    twap.unpersist()
  }
}
