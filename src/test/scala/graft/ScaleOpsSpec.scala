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
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
      .orderBy("o_orderpriority").collect()
    assert(salted.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sameElements(
      direct.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))))
  }

  test("value-salted distinct defuses a 50%-hot-key skew and keeps the exact answer") {
    import spark.implicits._
    // genuinely skewed corpus: half the rows share ONE key; values are
    // high-cardinality so the aggregation is holistic, not map-side-foldable
    val skewed = spark.range(0, 200000, 1, 8)
      .select(
        when(col("id") % 2 === 0, "HOT")
          .otherwise(concat(lit("k"), col("id") % 1000)).as("key"),
        col("id").as("v"))
    // 1. answers agree exactly with the direct aggregation
    val salted = ScaleOps.saltedDistinctOn(skewed, "key", "v")
      .orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val direct = skewed.groupBy("key")
      .agg(countDistinct("v").as("d"), count(lit(1)).as("n"))
      .orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(salted.sameElements(direct))
    // 2. the shuffle-level claim, measured not asserted-by-vibes: rows per
    // reducer partition when partitioning the way each plan's first
    // shuffle does. Key-only partitioning sends every HOT row to one
    // reducer; (key, value-salt) partitioning spreads them SaltBuckets ways.
    val p = 32
    def maxPartitionLoad(parts: org.apache.spark.sql.Column*): Long =
      skewed.repartition(p, parts: _*)
        .groupBy(spark_partition_id()).count()
        .agg(max("count")).head().getLong(0)
    val keyOnly = maxPartitionLoad(col("key"))
    val keySalted = maxPartitionLoad(col("key"), pmod(xxhash64(col("v")), lit(ScaleOps.SaltBuckets)))
    info(s"hottest reducer: key-only=$keyOnly rows, salted=$keySalted rows")
    assert(keyOnly >= 100000, "skew corpus lost its hot key")
    assert(keySalted.toDouble <= keyOnly.toDouble / 4,
      s"salting should cut the hottest reducer by >=4x (got $keyOnly -> $keySalted)")
  }

  test("salted join matches the plain join and defuses hot-key reducer load") {
    import spark.implicits._
    // fact with one hot FK (half the rows), small non-broadcastable-regime dim
    val fact = spark.range(0, 200000, 1, 8)
      .select(
        when(col("id") % 2 === 0, lit(7L)).otherwise(col("id") % 100).as("fk"),
        col("id").as("rowid"))
    val dim = spark.range(0, 100).select(col("id").as("dk"),
      concat(lit("grp"), col("id") % 10).as("grp"))
    // 1. exact answer equality with the plain join
    val salted = ScaleOps.saltedJoinOn(fact, dim, "fk", "dk", xxhash64(col("rowid")))
      .groupBy("grp").agg(count(lit(1)).as("n")).orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val plain = fact.join(dim, col("fk") === col("dk"))
      .groupBy("grp").agg(count(lit(1)).as("n")).orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(salted.sameElements(plain))
    // 2. measured shuffle claim: partitioning the fact the way each join's
    // exchange does — by fk alone vs by (fk, row-salt)
    val p = 32
    def maxPartitionLoad(parts: org.apache.spark.sql.Column*): Long =
      fact.repartition(p, parts: _*)
        .groupBy(spark_partition_id()).count()
        .agg(max("count")).head().getLong(0)
    val keyOnly = maxPartitionLoad(col("fk"))
    val keySalted = maxPartitionLoad(col("fk"),
      pmod(xxhash64(col("rowid")), lit(ScaleOps.SaltBuckets.toLong)))
    info(s"hottest reducer: key-only=$keyOnly rows, salted=$keySalted rows")
    assert(keyOnly >= 100000, "skew corpus lost its hot key")
    assert(keySalted.toDouble <= keyOnly.toDouble / 4,
      s"salting should cut the hottest reducer by >=4x (got $keyOnly -> $keySalted)")
  }

  test("bloom prune never drops a matching row and prunes most non-matches") {
    val fact = Tables.lineitem(spark, sf)
    val urgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val pruned = ScaleOps.bloomPrune(spark, fact, "l_orderkey", urgent, "o_orderkey")
    val total = fact.count()
    val prunedN = pruned.count()
    // true matches: semi join (what the bloom approximates from above)
    val matches = fact.join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    info(s"fact=$total, bloom-passed=$prunedN, true matches=$matches")
    // no false negatives: every matching row must survive the bloom
    val survivedMatches = pruned
      .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(survivedMatches == matches, "bloom dropped a matching row (false negative)")
    // measured pruning: passes >= matches (fp-only overshoot) and well under total
    assert(prunedN >= matches)
    assert(prunedN <= matches + math.max(100L, (total * 0.02).toLong),
      s"false-positive rate way over the configured 1% ($prunedN vs $matches matches)")
    assert(prunedN.toDouble / total < 0.35,
      s"bloom should prune ~80% of the fact at 20% dim selectivity ($prunedN / $total)")
  }

  test("approx percentiles: every group's GK estimate satisfies the in-band contract") {
    // the error bound now travels IN the result (exact percentiles +
    // contract booleans, hash-checked by the oracle) — assert every
    // group's booleans hold, and the exact columns agree with percentiles()
    val rows = ScaleOps.approxPercentiles(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(4), s"${r.getString(0)} p50 estimate outside ±0.02 quantile band")
      assert(r.getBoolean(5), s"${r.getString(0)} p90 estimate outside ±0.02 quantile band")
    }
    val exact = ScaleOps.percentiles(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.foreach { r =>
      assert((r.getDouble(1), r.getDouble(2)) == exact(r.getString(0)))
    }
  }

  test("incremental agg: merge equals recompute even with NULL timestamps planted") {
    import spark.implicits._
    // rows straddling the cutoff PLUS null-ts rows — under the r5 filters
    // (ts < cutoff / ts >= cutoff) the nulls vanished from both sides
    val ev = Seq(
      (Some("2024-05-30 10:00:00"), "a", 1.0),
      (Some("2024-06-02 10:00:00"), "a", 2.0),
      (None, "a", 4.0),
      (None, "b", 8.0),
      (Some("2024-06-01 00:00:00"), "b", 16.0))
      .toDF("ts_s", "event_type", "value")
      .select(col("ts_s").cast("timestamp").as("ts"), col("event_type"), col("value"))
    val merged = ScaleOps.incrementalAggFrom(ev, "2024-06-01").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // full recompute over everything, nulls included
    val full = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("cents"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(merged == full, s"merge != recompute: $merged vs $full")
    assert(merged("a") == ((3L, 700L)) && merged("b") == ((2L, 2400L)))
  }

  test("approx distinct: every group's HLL estimate satisfies the in-band contract") {
    val rows = ScaleOps.approxDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(3),
      s"${r.getString(0)}: HLL estimate more than 10% off exact=${r.getLong(1)}"))
    val exact = Tables.orders(spark, sf)
      .groupBy("o_orderpriority").agg(countDistinct("o_custkey").as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) == exact(r.getString(0))))
  }

  test("shard rebalance: ring moves ~1/17 of keys, naive mod moves almost all") {
    val r = ScaleOps.shardRebalance(spark, sf).head()
    val n = r.getAs[Long]("n_docs").toDouble
    val ring = r.getAs[Long]("moved_ring") / n
    val naive = r.getAs[Long]("moved_naive") / n
    // ring movement concentrates near the ideal 1/17 ≈ 5.9%; give vnode
    // placement variance generous room but keep the operational claim
    assert(ring > 0.0 && ring < 0.15, s"ring moved fraction $ring")
    assert(naive > 0.80, s"naive moved fraction $naive")
    assert(r.getAs[Boolean]("ring_wins_8x"))
  }

  test("sketch intersection: inclusion-exclusion estimate is in bound, exact side audited") {
    val r = ScaleOps.sketchIntersection(spark, sf).head()
    assert(r.getAs[Boolean]("within_10pct"))
    // an intersection can never exceed either side
    val both = r.getAs[Long]("exact_both")
    assert(both <= r.getAs[Long]("exact_a") && both <= r.getAs[Long]("exact_b"))
    // exact side re-derived through a different plan: distinct-set semi-join
    val o = Tables.orders(spark, sf)
    val viaJoin = o.filter(col("o_orderstatus") === "O").select("o_custkey").distinct()
      .join(o.filter(col("o_orderstatus") === "F").select("o_custkey").distinct(),
        Seq("o_custkey"), "left_semi")
      .count()
    assert(both === viaJoin)
  }
}
