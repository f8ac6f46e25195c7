package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CorpusOps, TextOps, TokenOps}
import graft.queries.{BehaviorOps, ChangeOps, StatOps, TemporalOps}

/** Sequential-reference sanity for the retrieval/stats family added in
  * round 9 (`bm25_rank`, `assoc_rules`, `benford_digits`,
  * `source_tv_distance`, `length_bucket_batches`, `inbatch_negatives`).
  * The DuckDB gate proves engine AGREEMENT; these tests pin the math the
  * two engines could agree wrongly about (the NOTES round-6 lesson): the
  * Benford literals against the JVM's own log10, metric range contracts,
  * and structural invariants of the batch/negative assignments.
  */
class RetrievalStatsSpec extends AnyFunSuite {
  import TestSpark._

  test("benford expected-ppm literals equal round(log10(1+1/d)*1e6)") {
    val r = StatOps.benfordDigits(spark, sf)
      .select("digit", "exp_ppm").collect()
      .map(row => row.getInt(0) -> row.getLong(1)).toMap
    assert(r.keySet == (1 to 9).toSet)
    (1 to 9).foreach { d =>
      val expect = math.round(math.log10(1.0 + 1.0 / d) * 1e6)
      assert(r(d) == expect, s"digit $d literal ${r(d)} != $expect")
    }
  }

  test("benford digit counts partition the orders table") {
    val r = StatOps.benfordDigits(spark, sf).cache()
    val orders = Tables.orders(spark, sf).count()
    assert(r.agg(sum("n")).head().getLong(0) == orders)
    // shares and deviations stay inside their ppm ranges
    assert(r.filter(col("obs_ppm") < 0 || col("obs_ppm") > 1000000L).count() == 0)
    assert(r.filter(col("dev_ppm") > 1000000L).count() == 0)
    r.unpersist()
  }

  test("assoc rules: confidence <= 1e6 ppm, rules are directional and keyed") {
    val r = BehaviorOps.assocRules(spark, sf).cache()
    assert(r.count() > 0)
    assert(r.filter(col("conf_ppm") > 1000000L).count() == 0)
    assert(r.filter(col("antecedent") === col("consequent")).count() == 0)
    assert(r.count() == r.select("antecedent", "consequent").distinct().count())
    r.unpersist()
  }

  test("assoc rules: orientation mirror — explode form equals the unionAll form") {
    // r17 batch 5 pins the rewrite: mirroring the canonical pair table by
    // exploding a 2-struct array must emit the IDENTICAL row multiset the
    // old unionAll-of-two-selects emitted (the rewrite exists so the pair
    // aggregate finalizes once instead of once per union branch)
    import spark.implicits._
    val canon = Seq((1L, 2L, 3L), (0L, 5L, 2L), (7L, 9L, 2L), (1L, 9L, 3L))
      .toDF("p1", "p2", "n_ab")
    val viaUnion = canon
      .select(col("p1").as("antecedent"), col("p2").as("consequent"), col("n_ab"))
      .unionAll(canon
        .select(col("p2").as("antecedent"), col("p1").as("consequent"), col("n_ab")))
    val viaExplode = canon
      .select(explode(array(
        struct(col("p1").as("antecedent"), col("p2").as("consequent"), col("n_ab")),
        struct(col("p2").as("antecedent"), col("p1").as("consequent"), col("n_ab"))))
        .as("r"))
      .select("r.antecedent", "r.consequent", "r.n_ab")
    assert(viaExplode.exceptAll(viaUnion).count() == 0)
    assert(viaUnion.exceptAll(viaExplode).count() == 0)
    assert(viaExplode.count() == 2 * canon.count())
  }

  test("assoc rules: confidence recomputes from hand-counted supports") {
    val p = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct().cache()
    val items = p.groupBy("l_partkey").agg(count(lit(1)).as("n_a")).cache()
    val top = BehaviorOps.assocRules(spark, sf).limit(10)
    val checked = top.join(items.withColumnRenamed("l_partkey", "antecedent"), "antecedent")
      .filter(col("conf_ppm") =!= expr("n_ab * 1000000L DIV n_a"))
      .count()
    assert(checked == 0)
    p.unpersist(); items.unpersist()
  }

  test("bm25: every ranked doc matches at least one query term, scores rank-ordered") {
    val r = TextOps.bm25Rank(spark, sf).collect()
    assert(r.nonEmpty && r.length <= 20)
    assert(r.forall(_.getLong(1) >= 1)) // n_terms
    val scores = r.map(_.getLong(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("tv distance is a metric-range quantity and covers all source pairs") {
    val r = CorpusOps.sourceTvDistance(spark, sf).cache()
    val nSrc = Tables.documents(spark, sf).select("source").distinct().count()
    assert(r.count() == nSrc * (nSrc - 1) / 2)
    assert(r.filter(col("tv_ppm") < 0 || col("tv_ppm") > 1000000L).count() == 0)
    r.unpersist()
  }

  test("length buckets: every doc lands in exactly one bucket, padding sound") {
    val r = TokenOps.lengthBucketBatches(spark, sf).cache()
    val docs = Tables.documents(spark, sf).count()
    assert(r.agg(sum("n_docs")).head().getLong(0) == docs)
    assert(r.filter(col("pad_tokens") < 0).count() == 0)
    assert(r.filter(col("efficiency_ppm") > 1000000L).count() == 0)
    // batches can pad at most (cap-size window) per doc: pad < 8 * n_docs
    assert(r.filter(col("pad_tokens") >= col("n_docs") * 8).count() == 0)
    r.unpersist()
  }

  test("rfm: quintiles are balanced and the grid partitions all customers") {
    val r = BehaviorOps.rfmSegments(spark, sf).cache()
    val customers = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(r.agg(sum("n_customers")).head().getLong(0) == customers)
    // ntile(5) balance: each score value holds n/5 customers ±1
    Seq("r_score", "f_score", "m_score").foreach { dim =>
      val per = r.groupBy(dim).agg(sum("n_customers").as("n")).collect()
        .map(row => row.getLong(0) -> row.getLong(1)).toMap
      assert(per.keySet == (1L to 5L).toSet, s"$dim must cover 1..5: ${per.keySet}")
      val (mn, mx) = (per.values.min, per.values.max)
      assert(mx - mn <= 1, s"$dim unbalanced: $per")
    }
    // labels follow the rule grid
    assert(r.filter(col("segment") === "champion" &&
      (col("r_score") < 4 || col("f_score") < 4)).count() == 0)
    r.unpersist()
  }

  test("cusum argmax lands on a planted level shift") {
    import spark.implicits._
    // 200 flat days at 1000 cents, then a step up to 3000 from day 120:
    // max |CUSUM| of a single mean shift sits AT the last pre-shift day
    val series = (0L until 200L).map(day =>
      (day, if (day < 120L) 1000L else 3000L)).toDF("day", "cents")
    val r = TemporalOps.cusumCore(series).filter(col("is_changepoint")).collect()
    assert(r.length == 1 && r.head.getLong(0) == 119L,
      s"change point must be the last pre-shift day (119): ${r.toSeq}")
    // a constant series has zero statistic everywhere — every day ties
    val flat = (0L until 50L).map(day => (day, 777L)).toDF("day", "cents")
    val z = TemporalOps.cusumCore(flat)
    assert(z.agg(max(abs(col("cusum_scaled")))).head().getLong(0) == 0L)
  }

  test("gini/pareto: coefficient in [0,1), top-20% share holds at least 20%") {
    val r = StatOps.giniPareto(spark, sf).cache()
    assert(r.count() > 0)
    assert(r.filter(col("gini") < 0.0 || col("gini") >= 1.0).count() == 0)
    // the top ceil(n/5) spenders are the LARGEST, so their share can
    // never fall below the uniform 1/5 (floor division costs <= 1 ppm)
    assert(r.filter(col("top20_share_ppm") < 199999L).count() == 0)
    r.unpersist()
  }

  test("hhi: bounded by monopoly, dominated term consistent with max share") {
    val r = StatOps.hhiConcentration(spark, sf).cache()
    assert(r.count() > 0)
    assert(r.filter(col("top_share_bp") > 10000L).count() == 0)
    assert(r.filter(col("hhi") > 100000000L).count() == 0)
    // the max-share term alone is a lower bound on the sum of squares
    assert(r.filter(col("hhi") < col("top_share_bp") * col("top_share_bp")).count() == 0)
    r.unpersist()
  }

  test("lexical diversity: ttr and simpson stay in ppm range, vocab <= tokens") {
    val r = TextOps.lexicalDiversity(spark, sf).cache()
    assert(r.count() > 0)
    assert(r.filter(col("vocab") > col("n_tokens")).count() == 0)
    assert(r.filter(col("ttr_ppm") > 1000000L || col("simpson_ppm") > 1000000L).count() == 0)
    r.unpersist()
  }

  test("proration: every order's allocated cents sum EXACTLY to its discount") {
    // the property the hash gate cannot test on its own — both engines
    // could share a broken shortfall formula and still agree; here the
    // engine's own output must satisfy the largest-remainder contract
    val r = ChangeOps.prorateAllocation(spark, sf).cache()
    assert(r.count() > 0)
    assert(r.filter(col("alloc_sum") =!= col("disc_cents")).count() == 0)
    // at most one extra cent per line, never a negative allocation
    assert(r.filter(col("bumped") >= col("n_lines")).filter(col("bumped") =!= col("n_lines")).count() == 0)
    assert(r.filter(col("min_alloc") < 0).count() == 0)
    r.unpersist()
  }

  test("late-arriving dim: every inferred key is a withheld key and backfills") {
    val r = ChangeOps.inferredDimBackfill(spark, sf).cache()
    assert(r.count() > 0)
    assert(r.filter(col("custkey") % 13 =!= 0).count() == 0)
    // referential integrity holds in the corpus, so the late batch
    // backfills every inferred member — none remain skeletal
    assert(r.filter(col("name_after") === "STILL_MISSING").count() == 0)
    r.unpersist()
  }

  test("source overlap: jaccard bounded, shared never exceeds either side") {
    val r = CorpusOps.sourceOverlap(spark, sf).cache()
    assert(r.filter(col("jaccard_ppm") > 1000000L).count() == 0)
    val perSrc = Tables.documents(spark, sf).groupBy("source").count()
      .agg(max("count")).head().getLong(0)
    assert(r.filter(col("n_shared") > perSrc).count() == 0)
    r.unpersist()
  }

  test("in-batch negatives: fan-out bounded by batch size, no self-pairs") {
    val r = CorpusOps.inbatchNegatives(spark, sf).cache()
    assert(r.count() > 0)
    assert(r.filter(col("n_negatives") > 7).count() == 0)
    // the id-sum checksum of a negative set can never include the anchor:
    // min negative differs from the anchor on every row
    assert(r.filter(col("neg_min") === col("doc_id")).count() == 0)
    r.unpersist()
  }
}
