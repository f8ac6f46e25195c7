package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.util.SessionCaches.PersistOnce

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (SURVEY.md §7.5 extension surface).
  *
  * Two paths:
  *  - [[annTopK]] — exact brute-force cosine top-k: a SMALL query set
  *    broadcast against the full corpus, ranked per query by a partitioned
  *    window. Scales linearly in corpus size × queries — at 100 TB the
  *    corpus streams through executors once per batch of queries, no
  *    shuffle of the corpus itself (the broadcast keeps the big side
  *    shuffle-free; the window partitions by query id, ~|queries × k| rows).
  *  - [[annLshTopK]] — random-hyperplane LSH: bucket every vector by the
  *    sign pattern of `Bits` seeded Gaussian projections, probe the query's
  *    bucket plus all Hamming-1 neighbors, exact-rank only the candidates.
  *    The corpus-side cost per query drops from O(n) to O(n / 2^Bits ×
  *    (Bits+1)). Approximate — but the approximation itself is
  *    deterministic, so the oracle pins the planes as SQL literal arrays
  *    and reproduces the bucketing bit-for-bit (dot products are
  *    sequential ascending double sums in both engines): full hash check,
  *    plus a recall contract on planted-cluster data in SimilaritySpec.
  */
object Similarity {

  val K = 5
  val Bits = 6
  val NumTables = 2
  val Dim = 64
  val Seed = 42L

  private def dot(s: SparkSession, a: Column, b: Column): Column =
    graft.functions.GraftFunctions.arrayDot(s, a, b)

  // memoized per (session, dataset): every ANN path and each Lloyd action
  // re-reads this narrow projection; one shared persisted copy replaces
  // ~5 parquet rescans per annIvfTopK call and survives bench passes
  private val embCache =
    graft.util.SessionCaches.memo[(SparkSession, String)]("similarity.emb")

  private def withNorm(s: SparkSession, d: String): DataFrame =
    embCache.getOrElseUpdate((s, d),
      Tables.fanout(s, Tables.embeddings(s, d))
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("nrm", sqrt(dot(s, col("v"), col("v"))))
        .persistOnce())

  /** Query set: every 100th vector — small by construction, broadcast. */
  private def querySet(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))

  /** Exact cosine top-K per query (ranked on the 6dp-rounded cosine with a
    * vec_id tie-break so both engines rank identically). */
  def annTopK(s: SparkSession, d: String): DataFrame =
    annTopKFor(s, d, querySample = None)

  /** [[annTopK]] restricted to an optional (small, broadcast) sample of
    * query ids — per-query results are independent, so restricting the
    * query set commutes with the top-K: this returns exactly the
    * full-run rows whose query_id is in the sample. */
  private def annTopKFor(s: SparkSession, d: String,
      querySample: Option[DataFrame]): DataFrame = {
    val emb = withNorm(s, d)
    val q0 = querySet(emb)
    val q = querySample.fold(q0)(qs =>
      q0.join(broadcast(qs), Seq("query_id"), "left_semi"))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("vec_id"))
    emb.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cosine", round(dot(s, col("v"), col("qv")) / (col("nrm") * col("qn")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= K)
      .select("query_id", "vec_id", "cosine", "rnk")
      .orderBy("query_id", "rnk")
  }

  val annTopKOracle: String = s"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id % 100 = 0),
scored AS (
  SELECT query_id, vec_id,
         round(list_cosine_similarity(v, qv), 6) AS cosine
  FROM emb JOIN q ON vec_id <> query_id),
ranked AS (
  SELECT query_id, vec_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY cosine DESC, vec_id ASC) AS INT) AS rnk
  FROM scored)
SELECT query_id, vec_id, cosine, rnk FROM ranked
WHERE rnk <= $K ORDER BY query_id, rnk"""

  /** The GATE variant of [[annTopK]]: exact ground truth restricted to
    * the seeded [[recallQuerySample]] (r14 verdict #3 — the full anchor
    * is O(n·q) = O(n²/100) by construction, quadratic at scale; the
    * sampled anchor is exact PER SAMPLED QUERY and O(corpus × budget)
    * total). Per-query results are independent, so restricting the query
    * set commutes with the top-K: every emitted row is identical to the
    * full run's row. `sample_q` rides in the schema so the anchor can't
    * silently detach from its support; [[annTopK]] itself stays full for
    * the planted-corpus recall contracts in SimilaritySpec. */
  def annTopKSampled(s: SparkSession, d: String): DataFrame = {
    val qs = recallQuerySample(withNorm(s, d))
    annTopKFor(s, d, Some(qs))
      .crossJoin(broadcast(qs.agg(count(lit(1)).as("sample_q"))))
      .select("query_id", "vec_id", "cosine", "rnk", "sample_q")
      .orderBy("query_id", "rnk")
  }

  /** Oracle: the full exact ranking (DuckDB at oracle scale is fine with
    * O(n·q)) filtered to the same seeded sample — sample-then-rank ≡
    * rank-then-sample per query independence. */
  lazy val annTopKSampledOracle: String = s"""
WITH qs AS (
  SELECT vec_id AS query_id FROM embeddings WHERE vec_id % 100 = 0
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $RecallQueryBudget)
SELECT query_id, vec_id, cosine, rnk, (SELECT count(*) FROM qs) AS sample_q
FROM ($annTopKOracle) t WHERE query_id IN (SELECT query_id FROM qs)
ORDER BY query_id, rnk"""

  /** Seeded random hyperplanes for `NumTables` independent hash tables
    * (NumTables × Bits × Dim doubles, generated on the driver — trivially
    * broadcastable at any scale). Multiple tables are the standard LSH
    * recall lever: a near neighbor is a candidate if it collides in ANY
    * table, so recall compounds as 1-(1-p_t)^L while the scanned fraction
    * stays ~L·(Bits+1)/2^Bits of the corpus. */
  /** Seeded plane sets for any (tables, bits) — memoized so a given
    * configuration always reuses identical planes; the default
    * configuration's planes back the pinned-literal oracle. */
  private val planeCache =
    scala.collection.concurrent.TrieMap[(Int, Int), Array[Array[Array[Double]]]]()

  private[graft] def planesFor(tables: Int, bits: Int): Array[Array[Array[Double]]] =
    planeCache.getOrElseUpdate((tables, bits), {
      // each (table, bit) plane draws from its OWN seeded stream, so the
      // plane sets are PREFIX-STABLE across bit counts: planesFor(t, b1)
      // is a prefix of planesFor(t, b2) for b1 < b2. That is what makes
      // the adaptive resolution an incremental REFINEMENT — when a
      // growing corpus crosses an effBits threshold, every existing
      // bucket splits in two (one new plane's sign) instead of the whole
      // corpus rehashing into unrelated buckets; an incrementally
      // maintained bucket index survives the resolution step with a
      // per-bucket split, never a rebuild.
      // splitmix64 the (seed, table, bit) triple: java.util.Random's own
      // seed scrambler leaves nearby seeds correlated in their first
      // draws, which measurably correlated adjacent planes (bucket bits
      // stopped being independent and recall dropped)
      def mix64(z0: Long): Long = {
        var z = z0 + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z ^ (z >>> 31)
      }
      Array.tabulate(tables, bits) { (t, b) =>
        val rng = new scala.util.Random(mix64(Seed ^ mix64(t.toLong << 32 | b)))
        Array.fill(Dim)(rng.nextGaussian())
      }
    })

  // ---- adaptive bucket resolution (the all-PAIRS LSH paths) ----
  //
  // A fixed bit count is the quadratic trap of pair-generating LSH: with
  // 2^Bits buckets, bucket occupancy grows ∝ n and the within-bucket pair
  // work grows ∝ n² — measured at sf1 (10× rows): dedup_cosine_lsh grew
  // 16× while every other query stayed ≤ linear. The fix is the standard
  // one: grow the bit count with the corpus so expected occupancy stays
  // ~constant (TargetBucket), making candidate work O(n·tables·(bits+1)).
  // Determinism survives because the resolution is a PURE INTEGER
  // function of count(*) — no float log2 whose rounding could diverge
  // between engines — and the oracle computes the same thresholds in SQL.
  // MaxBits caps the pinned-plane set (and the oracle's literal text).
  // 20 bits keeps occupancy ≤ TargetBucket up to ~33M vectors (r16: the
  // sf100 probe measured 2M vectors sitting exactly at the old 16-bit
  // cap — occupancy 30.5 vs sf30's 18.3, the top of the adaptive
  // window, and ANY further growth would have been quadratic). Because
  // the per-(table, bit) plane streams are PREFIX-STABLE (planesFor),
  // raising the cap is byte-identical for every corpus below the old
  // cap — the low effBits planes are the same planes.
  val MaxBits = 20
  val TargetBucket = 32

  /** Bits for an n-vector corpus: the smallest b in [Bits, MaxBits] with
    * n ≤ TargetBucket·2^b — integer comparisons only. */
  private[graft] def effBitsFor(n: Long): Int =
    Bits + (Bits until MaxBits).count(b => n > (TargetBucket.toLong << b))

  private[graft] lazy val adaptivePlanes: Array[Array[Array[Double]]] =
    planesFor(NumTables, MaxBits)

  /** Bucket of table `t` at an adaptive resolution: the low `effBits`
    * planes of the pinned MaxBits set (≡ masking the full bucket with
    * (1<<effBits)-1, which is how the SQL oracle states it). */
  private[graft] def bucketOfAdaptive(s: SparkSession, v: Column, t: Int,
      effBits: Int): Column =
    bucketOfPlanes(s, v, adaptivePlanes(t).take(effBits))

  /** SQL restatement of table `t`'s FULL MaxBits bucket (callers mask
    * with the adaptive resolution). */
  private[graft] def bucketCasesSqlAdaptive(t: Int): String = (0 until MaxBits).map { b =>
    val lit = adaptivePlanes(t)(b).mkString("[", ", ", "]")
    s"CASE WHEN list_dot_product(v, $lit) >= 0 THEN ${1 << b} ELSE 0 END"
  }.mkString(" +\n    ")

  /** SQL expression for [[effBitsFor]] over a column `c` = count(*). */
  private[graft] val effBitsSql: String =
    s"CAST($Bits${(Bits until MaxBits)
      .map(b => s" + CAST(c > ${TargetBucket.toLong << b} AS INT)").mkString} AS INT)"

  private def bucketOfPlanes(s: SparkSession, v: Column, planes: Array[Array[Double]]): Column =
    planes.indices.map { b =>
      when(dot(s, v, typedlit(planes(b).toSeq)) >= 0, lit(1 << b)).otherwise(lit(0))
    }.reduce(_ + _)

  /** LSH-bucketed approximate top-K: in each of the `NumTables` tables,
    * probe the query's own bucket plus all Hamming-1 buckets; union the
    * candidates across tables, then exact-rank. Oracle-checked (planes
    * pinned as SQL literals); SimilaritySpec asserts recall@K ≥ 0.9
    * against [[annTopK]] on planted-cluster data. */
  def annLshTopK(s: SparkSession, d: String): DataFrame = {
    // adaptive bucket resolution (see the adaptive-resolution note below):
    // per-query candidate work is ∝ n·tables·(bits+1)/2^bits, so a FIXED
    // bit count makes every query's cost grow with the corpus; the
    // count-derived bit count keeps expected bucket occupancy — and so
    // per-query serving cost — ~constant at any n. The oracle mirrors the
    // integer thresholds and masks the same pinned MaxBits planes.
    val effBits = effBitsFor(Tables.embeddings(s, d).count())
    annLshWithPlanes(s, d, adaptivePlanes.map(_.take(effBits)))
  }

  /** Parameterized variant: the (bits, tables) knobs trade scanned
    * fraction (~tables·(bits+1)/2^bits) against recall — swept on planted
    * data in SimilaritySpec; the sweep numbers live in NOTES.md. */
  def annLshTopK(s: SparkSession, d: String, bits: Int, tables: Int): DataFrame =
    annLshWithPlanes(s, d, planesFor(tables, bits))

  private def annLshWithPlanes(s: SparkSession, d: String,
      planes: Array[Array[Array[Double]]],
      querySample: Option[DataFrame] = None): DataFrame = {
    val tables = planes.length
    val bits = planes(0).length
    val emb0 = withNorm(s, d)
    val emb = (0 until tables).foldLeft(emb0) { (df, t) =>
      df.withColumn(s"b$t", bucketOfPlanes(s, col("v"), planes(t)))
    }
    val bucketArr = array((0 until tables).map(t => col(s"b$t")): _*)
    // corpus side: one (tbl, bucket) row per table — map-side only, the
    // broadcast query side keeps the corpus shuffle-free
    val corpus = emb.select(col("vec_id"), col("v"), col("nrm"),
      posexplode(bucketArr).as(Seq("tbl", "bucket")))
    val probes = array((lit(0) +: (0 until bits).map(b => lit(1 << b))): _*)
    val qBase0 = emb.filter(col("vec_id") % 100 === 0)
    val qBase = querySample.fold(qBase0)(qs => qBase0.join(
      broadcast(qs.withColumnRenamed("query_id", "vec_id")),
      Seq("vec_id"), "left_semi"))
    val q = qBase
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"),
        posexplode(bucketArr).as(Seq("tbl", "qb")))
      .select(col("query_id"), col("qv"), col("qn"), col("tbl"),
        explode(probes).as("flip"), col("qb"))
      .withColumn("probe_bucket", col("qb").bitwiseXOR(col("flip")))
      .drop("qb", "flip")
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("vec_id"))
    corpus.join(broadcast(q),
        corpus("tbl") === q("tbl") && col("bucket") === col("probe_bucket") &&
          col("vec_id") =!= col("query_id"))
      // score IN the join and project both vectors away immediately: the
      // dedup below then shuffles 24-byte rows, not vector pairs (the
      // r13 sf10 probe's finding — see cosinePairsLsh). A vector
      // colliding in several tables is still ONE candidate, with an
      // identical cosine on every collision.
      .select(col("query_id"), col("vec_id"),
        round(dot(s, col("v"), col("qv")) / (col("nrm") * col("qn")), 6).as("cosine"))
      .dropDuplicates("query_id", "vec_id")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= K)
      .select("query_id", "vec_id", "cosine", "rnk")
      .orderBy("query_id", "rnk")
  }

  /** The LSH oracle mirrors [[annLshTopK]] exactly, with the seeded planes
    * embedded as literal DOUBLE[] arrays (Double.toString round-trips, so
    * DuckDB parses the identical doubles; the sign of the identical dot
    * product then yields the identical bucket in every table). */
  lazy val annLshOracle: String = {
    val bCols = (0 until NumTables)
      .map(t => s"((${bucketCasesSqlAdaptive(t)}) & ((1 << p.effbits) - 1)) AS b$t")
      .mkString(",\n  ")
    val corpusUnion = (0 until NumTables)
      .map(t => s"SELECT vec_id, v, $t AS tbl, b$t AS bucket FROM b")
      .mkString("\nUNION ALL ")
    val qUnion = (0 until NumTables)
      .map(t => s"SELECT vec_id AS query_id, v AS qv, $t AS tbl, b$t AS qb FROM b WHERE vec_id % 100 = 0")
      .mkString("\nUNION ALL ")
    s"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
params AS (SELECT $effBitsSql AS effbits
           FROM (SELECT count(*) AS c FROM embeddings)),
b AS (SELECT vec_id, v,
  $bCols
  FROM emb, params p),
corpus AS ($corpusUnion),
q AS ($qUnion),
probes AS (
  SELECT query_id, tbl, xor(qb, f.flip) AS probe_bucket
  FROM q CROSS JOIN (VALUES (0)${(0 until MaxBits).map(x => s", (${1 << x})").mkString}) AS f(flip), params p
  WHERE f.flip < (1 << p.effbits)),
cand0 AS (
  SELECT DISTINCT query_id, vec_id
  FROM corpus c JOIN probes p
    ON c.tbl = p.tbl AND c.bucket = p.probe_bucket AND c.vec_id <> p.query_id),
cand AS (
  SELECT c.query_id, c.vec_id,
         round(list_cosine_similarity(e.v, qe.v), 6) AS cosine
  FROM cand0 c JOIN emb e ON e.vec_id = c.vec_id
  JOIN emb qe ON qe.vec_id = c.query_id),
ranked AS (
  SELECT query_id, vec_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY cosine DESC, vec_id ASC) AS INT) AS rnk
  FROM cand)
SELECT query_id, vec_id, cosine, rnk FROM ranked
WHERE rnk <= $K ORDER BY query_id, rnk"""
  }

  val NumCentroids = 16
  val NProbe = 4
  val LloydIters = 2

  private def unitNorm(c: Array[Double]): Array[Double] = {
    // sequential ascending sum — the same order DuckDB's list_dot_product
    // uses, so both engines derive bit-identical norms from equal inputs
    var sq = 0.0; var k = 0
    while (k < c.length) { sq += c(k) * c(k); k += 1 }
    val n = math.sqrt(sq)
    c.map(_ / n)
  }

  /** Cell-affinity scores as an array of (cosine, cid) structs; reduced
    * with array_max / array_sort the lexicographic struct ordering makes
    * argmax and top-NProbe pure codegen'd Catalyst (ties → higher cid,
    * mirrored by ORDER BY score DESC, cid DESC in the oracle). */
  private def cellScores(s: SparkSession, v: Column, cents: Seq[(Int, Array[Double])]): Column =
    array(cents.map { case (i, c) =>
      struct(dot(s, v, typedlit(c.toSeq)).as("score"), lit(i).as("cid"))
    }: _*)

  /** Lloyd-refined IVF centroids: seed with the `NumCentroids` lowest-id
    * vectors, then `LloydIters` rounds of (assign every vector to its
    * nearest-by-cosine centroid, recompute each cell's per-dimension mean).
    * Returns (cid, unit-normalized centroid); a cell that loses all members
    * drops out with the surviving cids unchanged.
    *
    * The per-iteration collect is NumCentroids×Dim means (~16×64 doubles)
    * — index METADATA, not data; at 100 TB the assignment/mean passes are
    * full-cluster jobs and only the kilobyte-sized centroid table ever
    * reaches the driver. Cross-engine determinism: the per-cell mean is
    * computed in FIXED POINT — each element is floor-quantized to 1e-6
    * (floor of the identical binary double is bit-identical in both
    * engines) and summed as exact integers, which is order-independent,
    * then one double division by 1e6·count. Unlike a float avg(), whose
    * summation order is shuffle-dependent, this mean is provably the same
    * in Spark, in DuckDB, and across runs; norms/dots stay sequential
    * ascending sums — so the oracle ([[annIvfOracle]]) reproduces the
    * exact same index in SQL. */
  // the IVF index is built once and queried many times — memoize the
  // (kilobyte-sized) refined centroids per (session, dataset) exactly like
  // a vector store persists its index; both Lloyd assignment passes rerun
  // only when the corpus changes
  private val centroidCache =
    graft.util.SessionCaches.memo[(SparkSession, String)]("similarity.centroids")

  private[graft] def lloydCentroidsCached(s: SparkSession, d: String, emb: DataFrame): Seq[(Int, Array[Double])] =
    centroidCache.getOrElseUpdate((s, d), lloydCentroids(s, emb))

  private[graft] def lloydCentroids(s: SparkSession, emb: DataFrame): Seq[(Int, Array[Double])] = {
    val seeds = emb.orderBy("vec_id").limit(NumCentroids)
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    var cents: Seq[(Int, Array[Double])] = seeds.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
    for (_ <- 0 until LloydIters) {
      val unit = cents.map { case (i, c) => (i, unitNorm(c)) }
      val assigned = emb.withColumn("cell",
        array_max(cellScores(s, col("v"), unit)).getField("cid"))
      val means = assigned.select(col("cell"), posexplode(col("v")))
        .groupBy("cell", "pos")
        .agg(sum(floor(col("col") * lit(1e6)).cast("long")).as("q"),
          count(lit(1)).as("cnt"))
        .collect()
      cents = means.groupBy(_.getInt(0)).map { case (cid, rs) =>
        val arr = new Array[Double](Dim)
        rs.foreach(r => arr(r.getInt(1)) = r.getLong(2).toDouble / (1e6 * r.getLong(3)))
        (cid, arr)
      }.toSeq.sortBy(_._1)
    }
    cents.map { case (i, c) => (i, unitNorm(c)) }
  }

  /** IVF-style ANN: the corpus is Voronoi-partitioned around Lloyd-refined
    * centroids ([[lloydCentroids]]), each query probes its `NProbe`
    * nearest cells, and only those cells' vectors are exact-ranked.
    * Corpus-side cost per query drops to ~NProbe/NumCentroids of brute
    * force. Oracle-checked — the deterministic index construction
    * (including both Lloyd rounds) is mirrored in SQL, so the APPROXIMATE
    * result is hash-checkable, not just rows-only; recall@K ≥ 0.9 on
    * planted-cluster data asserted in SimilaritySpec. */
  def annIvfTopK(s: SparkSession, d: String): DataFrame =
    annIvfTopK(s, d, NProbe)

  /** Parameterized variant: `nprobe` is the query-time cost knob —
    * corpus fraction scanned ≈ nprobe/NumCentroids; swept on planted data
    * in SimilaritySpec (numbers in NOTES.md). The default backs the
    * oracle. */
  def annIvfTopK(s: SparkSession, d: String, nprobe: Int): DataFrame =
    annIvfTopKFor(s, d, nprobe, querySample = None)

  /** [[annIvfTopK]] restricted to an optional broadcast query sample —
    * per-query probe sets and rankings are independent, so the sampled
    * rows are identical to the full run's (the [[annTopKFor]] argument). */
  private def annIvfTopKFor(s: SparkSession, d: String, nprobe: Int,
      querySample: Option[DataFrame]): DataFrame = {
    val emb = withNorm(s, d)
    val cents = lloydCentroidsCached(s, d, emb)
    val assigned = emb.withColumn("cell",
      array_max(cellScores(s, col("v"), cents)).getField("cid"))
    val q0 = assigned.filter(col("vec_id") % 100 === 0)
    val qf = querySample.fold(q0)(qs => q0.join(
      broadcast(qs.withColumnRenamed("query_id", "vec_id")), Seq("vec_id"), "left_semi"))
    val q = qf
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"),
        // probe the nprobe best cells: sort scores desc, take cids
        explode(slice(reverse(array_sort(cellScores(s, col("v"), cents))), 1, nprobe)
          .getField("cid")).as("probe_cell"))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("vec_id"))
    assigned.join(broadcast(q),
        col("cell") === col("probe_cell") && col("vec_id") =!= col("query_id"))
      .withColumn("cosine", round(dot(s, col("v"), col("qv")) / (col("nrm") * col("qn")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= K)
      .select("query_id", "vec_id", "cosine", "rnk")
      .orderBy("query_id", "rnk")
  }

  /** Mirrors [[annIvfTopK]] in SQL, including the Lloyd refinement: same
    * seed centroids (lowest-id vectors), then `LloydIters` unrolled rounds
    * of assign (score DESC, cid DESC argmax — matching Spark's
    * lexicographic struct array_max) + the fixed-point per-dimension mean
    * + unit-normalization, then the same NProbe probe set and exact
    * re-rank. The mean sums floor-quantized 1e-6 integers — exact,
    * order-independent, bit-identical across engines and runs (see
    * [[lloydCentroids]]); every other step (norms, dots) is a sequential
    * ascending sum identical in both engines. */
  lazy val annIvfOracle: String = {
    def iter(k: Int): String = s"""
s$k AS (SELECT e.vec_id, c.cid, list_dot_product(e.v, c.cv) AS score
        FROM emb e CROSS JOIN c${k}n c),
a$k AS (SELECT vec_id, cid AS cell FROM (
          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
            ORDER BY score DESC, cid DESC) AS rn FROM s$k) t WHERE rn = 1),
c${k + 1} AS (SELECT cell AS cid, list(m ORDER BY dim) AS cv FROM (
          SELECT a.cell, d.i AS dim,
                 sum(CAST(floor(e.v[d.i] * 1000000) AS BIGINT)) / (1000000.0 * count(*)) AS m
          FROM a$k a JOIN emb e USING (vec_id) CROSS JOIN dims d
          GROUP BY a.cell, d.i) t GROUP BY cell),
c${k + 1}n AS (SELECT cid, list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv))) AS cv
        FROM c${k + 1}),"""
    val iters = (0 until LloydIters).map(iter).mkString
    val T = LloydIters
    s"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
dims AS (SELECT unnest(generate_series(1, $Dim)) AS i),
cent AS (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT $NumCentroids),
c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, v AS cv FROM cent),
c0n AS (SELECT cid, list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv))) AS cv FROM c0),$iters
sF AS (SELECT e.vec_id, c.cid, list_dot_product(e.v, c.cv) AS score
       FROM emb e CROSS JOIN c${T}n c),
assigned AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid DESC) AS rn
    FROM sF) t WHERE rn = 1),
qprobe AS (
  SELECT vec_id AS query_id, cid AS probe_cell FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid DESC) AS rn
    FROM sF WHERE vec_id % 100 = 0) t WHERE rn <= $NProbe),
cand AS (
  SELECT p.query_id, a.vec_id,
         round(list_cosine_similarity(e.v, qe.v), 6) AS cosine
  FROM qprobe p
  JOIN assigned a ON a.cell = p.probe_cell AND a.vec_id <> p.query_id
  JOIN emb e ON e.vec_id = a.vec_id
  JOIN emb qe ON qe.vec_id = p.query_id),
ranked AS (
  SELECT query_id, vec_id, cosine,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY cosine DESC, vec_id ASC) AS INT) AS rnk
  FROM cand)
SELECT query_id, vec_id, cosine, rnk FROM ranked
WHERE rnk <= $K ORDER BY query_id, rnk"""
  }

  /** The GATE variant of [[annIvfTopK]] — seeded query budget, same shape
    * as [[annTopKSampled]]. The IVF scan is sublinear PER QUERY
    * (nprobe/NumCentroids of the corpus), but with FIXED centroids the
    * cells grow with n, so the full 1%-of-corpus query set made the gate
    * O(n²·nprobe/C/100): 12.8 s at sf10 → 134.9 s at sf30 (10.6× for 3×
    * data, the r15 decade probe's largest step). The budget makes it
    * O(corpus × budget · nprobe/C); [[annIvfTopK]] stays full for the
    * planted recall contracts and the nprobe sweep. */
  def annIvfTopKSampled(s: SparkSession, d: String): DataFrame = {
    val qs = recallQuerySample(withNorm(s, d))
    annIvfTopKFor(s, d, NProbe, Some(qs))
      .crossJoin(broadcast(qs.agg(count(lit(1)).as("sample_q"))))
      .select("query_id", "vec_id", "cosine", "rnk", "sample_q")
      .orderBy("query_id", "rnk")
  }

  lazy val annIvfSampledOracle: String = s"""
WITH qs AS (
  SELECT vec_id AS query_id FROM embeddings WHERE vec_id % 100 = 0
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $RecallQueryBudget)
SELECT query_id, vec_id, cosine, rnk, (SELECT count(*) FROM qs) AS sample_q
FROM ($annIvfOracle) t WHERE query_id IN (SELECT query_id FROM qs)
ORDER BY query_id, rnk"""

  /** Directed k-NN GRAPH over the whole corpus — every vector's top-k
    * nearest neighbors among its LSH candidates (same pinned hyperplane
    * buckets + Hamming-1 probes as [[graft.ops.Dedup.cosinePairsLsh]],
    * but directed and ranked instead of thresholded). This is the
    * structure semantic-dedup clustering, diversity sampling, and
    * label-propagation pipelines consume. Cost: O(n · tables · (bits+1))
    * candidate lookups + a per-vector ranking window — never all-pairs;
    * vectors whose buckets collide with nothing emit no edges (the
    * approximate trade, deterministic and mirrored in the oracle). */
  // three consumers rebuild the same edge set (knn_graph, graph_pagerank,
  // graph_triangles) — memoize the ranked edges per (session, dataset, k)
  // like the IVF index above; the graph is k·n rows, far smaller than the
  // candidate join that produces it
  private val knnCache =
    graft.util.SessionCaches.memo[(SparkSession, String, Int)]("similarity.knn")

  def knnGraph(s: SparkSession, d: String, k: Int = 3): DataFrame =
    knnCache.getOrElseUpdate((s, d, k), {
      // the edge set is a stored corpus artifact like the MinHash band
      // index (r10 verdict #2): the LSH candidate join + ranking window
      // run once per corpus version and land on disk via SilverArtifact;
      // a cold session's graph queries (link_prediction, pagerank,
      // triangles, bfs) start from a k·n-row parquet read instead of
      // rebuilding the candidate join. Fingerprinted on the embeddings
      // part files + the LSH/banding parameters.
      val base = graft.util.SilverArtifact.pathFor(d, s"knn_k$k")
      val fp = graft.util.SilverArtifact.sourceFingerprint(
        s"$d/embeddings.parquet",
        s"knn-v3-pfx-t${NumTables}mb${MaxBits}tb${TargetBucket}k$k")
      graft.util.SilverArtifact.getOrBuild(s, base, fp) {
        knnGraphUncached(s, d, k)
      }
        // restore the (vec_a, rnk) presentation order the parquet read
        // drops — the knn_graph gate hashes this frame directly
        .orderBy("vec_a", "rnk")
        .persistOnce()
    })

  private def knnGraphUncached(s: SparkSession, d: String, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    // adaptive resolution, same reasoning as annLshTopK: the k-NN build is
    // ALL-pairs-shaped (every vector probes), so fixed bits would make the
    // edge-set build quadratic in n — the artifact build must stay linear
    // for the once-per-corpus-version story to hold at 100 TB
    // The staged build below ships the replicated probe side as float32
    // (halving its ~37 GB sf100 shuffle) and casts back at score time —
    // EXACT only because the source embeddings are float32, so
    // double→float→double round-trips bit-identically. A future dataset
    // with genuine float64 embeddings would silently perturb cosines and
    // surface only as an opaque gate-hash mismatch (r15 ADVICE): fail
    // loudly at plan time instead.
    Tables.embeddings(s, d).schema("embedding").dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, _) => ()
      case other => throw new IllegalStateException(
        s"knnGraph requires float32 source embeddings (found $other in " +
          s"$d/embeddings.parquet): the build ships the probe side as " +
          "array<float> for shuffle width, which is exact only when the " +
          "source is float32. For wider embeddings, drop the narrowing " +
          "cast in partialTopK (at double the probe shuffle) or quantize " +
          "the corpus to float32 upstream.")
    }
    val nVecs = Tables.embeddings(s, d).count()
    val effBits = effBitsFor(nVecs)
    val planes = adaptivePlanes.map(_.take(effBits))
    val emb0 = withNorm(s, d)
    val emb = (0 until NumTables).foldLeft(emb0) { (df, t) =>
      df.withColumn(s"b$t", bucketOfPlanes(s, col("v"), planes(t)))
    }
    val bucketArr = array((0 until NumTables).map(t => col(s"b$t")): _*)
    // score inside the bucket join, vectors projected away in the same
    // operator — see cosinePairsLsh's in-body note: the old
    // distinct-ids-then-rejoin-vectors shape materialized ~1 KB per
    // candidate row and killed the sf10 build (the r13 probe's finding);
    // post-join rows here are 24 bytes
    val side = emb.select(col("vec_id"), col("v"), col("nrm"),
      posexplode(bucketArr).as(Seq("tbl", "bucket")))
    val allFlips: Seq[Int] = 0 +: (0 until effBits).map(b => 1 << b)
    // One sub-build over a (tables, flips) slice of the probe space:
    // score in the join, collapse candidates INSIDE a map-combining
    // bounded top-k (`topk_min_distinct` — one slot per neighbor id, so a
    // pair colliding in several tables/probes can't fill two slots), emit
    // ≤ k rows per vector. Keys: the 6-dp-rounded cosine ×1e6 is an exact
    // integer, so (−cosine·1e6, vec_b) ascending ≡ (cosine DESC, vec_b
    // ASC) — exactly the ranking window this replaces (which, with
    // dropDuplicates, re-shuffled the FULL O(n·probes·occupancy) scored
    // candidate set twice — ~2×10⁹ rows per pass at sf100).
    //
    // The probe side is replicated (flips)× per table, so ITS vector
    // payload dominates the sub-build's shuffle — and the source
    // embeddings ARE float32, so double→float→double round-trips exactly:
    // ship the float array (260 B/row instead of 520 B) and cast back at
    // score time for a bit-identical cosine. (The r15 sf100 probe
    // measured the double-payload probe shuffle alone at ~37 GB.)
    def partialTopK(tables: Seq[Int], flips: Seq[Int]): DataFrame = {
      val sideT = side.filter(col("tbl").isin(tables: _*))
      val probed = sideT.select(col("vec_id"),
        col("v").cast("array<float>").as("vf"), col("nrm"), col("tbl"),
        explode(array(flips.map(lit(_)): _*)).as("flip"), col("bucket"))
        .withColumn("probe_bucket", col("bucket").bitwiseXOR(col("flip")))
      probed.select(col("vec_id").as("vec_a"), col("vf").as("vfa"),
          col("nrm").as("na"), col("tbl"), col("probe_bucket").as("bucket"))
        .join(sideT.select(col("vec_id").as("vec_b"), col("v").as("vb"),
          col("nrm").as("nb"), col("tbl"), col("bucket")), Seq("tbl", "bucket"))
        .filter(col("vec_a") =!= col("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          round(dot(s, col("vfa").cast("array<double>"), col("vb")) /
            (col("na") * col("nb")), 6).as("cosine"))
        .select(col("vec_a"), col("vec_b"),
          (-round(col("cosine") * lit(1e6))).cast("long").as("negc"))
        .groupBy("vec_a")
        .agg(call_function("topk_min_distinct",
          col("negc"), col("vec_b"), lit(k)).as("top"))
        .select(col("vec_a"), posexplode(col("top")))
        .select(col("vec_a"), col("col.id").as("vec_b"), col("col.dist").as("negc"))
    }
    // STAGED build beyond ~1M vectors: with 2M+ distinct vec_a groups per
    // task the partial aggregate exceeds ObjectHashAggregate's hash
    // budget and falls back to sorting its whole input — one job then
    // holds the full candidate sort spill PLUS the probe shuffle on disk
    // simultaneously (the r15 sf100 ENOSPC, ~60 GB transient). One
    // sub-job per (table, probe half) caps the live spill at a quarter;
    // each sub-job lands only n·k partial rows, and bounded top-k is a
    // semilattice (global top-k = top-k of the union of slice top-k's;
    // the distinct slot-per-id rule absorbs cross-slice duplicates), so
    // the cheap merge is exact.
    val slices: Seq[(Seq[Int], Seq[Int])] =
      if (nVecs <= 1000000L) Seq((0 until NumTables, allFlips))
      else {
        val halves = allFlips.grouped((allFlips.size + 1) / 2).toSeq
        for (t <- 0 until NumTables; fg <- halves) yield (Seq(t), fg)
      }
    val partials =
      if (slices.size == 1) partialTopK(slices.head._1, slices.head._2)
      else {
        val scratch = graft.util.TempDirs.scratch("graft_knn_partial")
        slices.zipWithIndex.foreach { case ((ts, fs), i) =>
          partialTopK(ts, fs).write.mode("overwrite").parquet(s"$scratch/p$i")
        }
        s.read.parquet(s"$scratch/p*")
      }
    // final merge over ≤ slices·k rows per vector — ranks come from the
    // merged top-k's posexplode (for a single slice this re-ranks the
    // slice's own rows: an identity merge)
    partials
      .groupBy("vec_a")
      .agg(call_function("topk_min_distinct",
        col("negc"), col("vec_b"), lit(k)).as("top"))
      .select(col("vec_a"), posexplode(col("top")))
      .select(col("vec_a"), col("col.id").as("vec_b"),
        // recover the 6-dp cosine: negc/1e6 is the correctly-rounded
        // double of the same decimal round() produced
        (-col("col.dist") / lit(1e6)).as("cosine"),
        (col("pos") + 1).cast("int").as("rnk"))
      .orderBy("vec_a", "rnk")
  }

  def knnGraphOracle(k: Int = 3): String = {
    val bCols = (0 until NumTables)
      .map(t => s"((${bucketCasesSqlAdaptive(t)}) & ((1 << p.effbits) - 1)) AS b$t")
      .mkString(",\n  ")
    val sideUnion = (0 until NumTables)
      .map(t => s"SELECT vec_id, $t AS tbl, b$t AS bucket FROM b")
      .mkString("\nUNION ALL ")
    s"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
params AS (SELECT $effBitsSql AS effbits
           FROM (SELECT count(*) AS c FROM embeddings)),
b AS (SELECT vec_id, v,
  $bCols
  FROM emb, params p),
side AS ($sideUnion),
probed AS (
  SELECT vec_id, tbl, xor(bucket, f.flip) AS bucket
  FROM side CROSS JOIN (VALUES (0)${(0 until MaxBits).map(x => s", (${1 << x})").mkString}) AS f(flip), params p
  WHERE f.flip < (1 << p.effbits)),
cand AS (
  SELECT DISTINCT p.vec_id AS vec_a, s.vec_id AS vec_b
  FROM probed p JOIN side s ON p.tbl = s.tbl AND p.bucket = s.bucket
  WHERE p.vec_id <> s.vec_id)
SELECT vec_a, vec_b, cosine, rnk FROM (
  SELECT c.vec_a, c.vec_b,
         round(list_cosine_similarity(a.v, bb.v), 6) AS cosine,
         CAST(row_number() OVER (PARTITION BY c.vec_a
           ORDER BY round(list_cosine_similarity(a.v, bb.v), 6) DESC, c.vec_b) AS INT) AS rnk
  FROM cand c
  JOIN emb a ON a.vec_id = c.vec_a
  JOIN emb bb ON bb.vec_id = c.vec_b) t
WHERE rnk <= $k
ORDER BY vec_a, rnk"""
  }

  /** Int8-quantized ANN: symmetric per-vector quantization
    * (scale = 127 / max|v_i|, q_i = ⌊v_i·scale⌋), ranking on the quantized
    * cosine qa·qb / (|qa||qb|). The memory/bandwidth story of real vector
    * stores — int8 codes are 4× smaller than float32, so 4× more corpus
    * fits in executor cache / a broadcast, and the inner product is exact
    * integer arithmetic (order-independent, overflow-free at 127²·Dim ≈
    * 10⁶) — which also makes the APPROXIMATE result hash-checkable
    * cross-engine, unlike a float-sum rerank. Same broadcast-query /
    * corpus-never-shuffles shape as [[annTopK]]; recall vs the exact
    * ranking is asserted in SimilaritySpec. */
  def annInt8TopK(s: SparkSession, d: String): DataFrame =
    annInt8TopKFor(s, d, querySample = None)

  /** [[annInt8TopK]] restricted to an optional broadcast query-id sample
    * (same commutes-with-top-K argument as [[annTopKFor]]). */
  private def annInt8TopKFor(s: SparkSession, d: String,
      querySample: Option[DataFrame]): DataFrame = {
    val emb = withNorm(s, d)
      .withColumn("sc", lit(127.0) / greatest(
        array_max(transform(col("v"), abs(_))), lit(1e-12)))
      .withColumn("q", transform(col("v"), x => floor(x * col("sc")).cast("long")))
      // codegen dot (ArrayDot) over the codes AS DOUBLES: every product
      // and partial sum is an exactly-representable integer (≤ 127²·64 ≪
      // 2⁵³), so the double dot EQUALS the integer dot bit for bit — and
      // the interpreted aggregate(zip_with(...)) lambda this replaces
      // cost 3× the double-bruteforce query per candidate pair at sf10
      // (181.8 s vs 59.5 s, r14 16 GB probe)
      .withColumn("qd", col("q").cast("array<double>"))
      .withColumn("qn", sqrt(dot(s, col("qd"), col("qd"))))
      .select("vec_id", "qd", "qn")
    val qs0 = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("qd").as("qqd"), col("qn").as("qqn"))
    val qs = querySample.fold(qs0)(sample =>
      qs0.join(broadcast(sample), Seq("query_id"), "left_semi"))
    val w = Window.partitionBy("query_id").orderBy(desc("qcos"), asc("vec_id"))
    emb.join(broadcast(qs), col("vec_id") =!= col("query_id"))
      .withColumn("qcos", round(dot(s, col("qd"), col("qqd")) / (col("qn") * col("qqn")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= K)
      .select("query_id", "vec_id", "qcos", "rnk")
      .orderBy("query_id", "rnk")
  }

  val annInt8Oracle: String = s"""
WITH emb0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
qz AS (
  SELECT vec_id,
         list_transform(v, x -> CAST(floor(x * (127.0 /
           greatest(list_max(list_transform(v, y -> abs(y))), 1e-12))) AS BIGINT)) AS q
  FROM emb0),
emb AS (
  SELECT vec_id, q,
         sqrt(CAST(list_sum(list_transform(q, x -> x * x)) AS DOUBLE)) AS qn
  FROM qz),
scored AS (
  SELECT qe.vec_id AS query_id, e.vec_id,
         round(CAST(list_sum(list_transform(generate_series(1, $Dim),
             i -> e.q[i] * qe.q[i])) AS DOUBLE) / (e.qn * qe.qn), 6) AS qcos
  FROM emb e JOIN emb qe ON qe.vec_id % 100 = 0 AND e.vec_id <> qe.vec_id),
ranked AS (
  SELECT query_id, vec_id, qcos,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY qcos DESC, vec_id ASC) AS INT) AS rnk
  FROM scored)
SELECT query_id, vec_id, qcos, rnk FROM ranked
WHERE rnk <= $K ORDER BY query_id, rnk"""

  /** The GATE variant of [[annInt8TopK]] — seeded query budget, same
    * shape as [[annTopKSampled]] (r14 verdict #3). */
  def annInt8TopKSampled(s: SparkSession, d: String): DataFrame = {
    val qs = recallQuerySample(withNorm(s, d))
    annInt8TopKFor(s, d, Some(qs))
      .crossJoin(broadcast(qs.agg(count(lit(1)).as("sample_q"))))
      .select("query_id", "vec_id", "qcos", "rnk", "sample_q")
      .orderBy("query_id", "rnk")
  }

  lazy val annInt8SampledOracle: String = s"""
WITH qs AS (
  SELECT vec_id AS query_id FROM embeddings WHERE vec_id % 100 = 0
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $RecallQueryBudget)
SELECT query_id, vec_id, qcos, rnk, (SELECT count(*) FROM qs) AS sample_q
FROM ($annInt8Oracle) t WHERE query_id IN (SELECT query_id FROM qs)
ORDER BY query_id, rnk"""

  // ---- Product quantization (PQ) ---------------------------------------

  val PqM = 8    // subspaces
  val PqSub = Dim / PqM
  val PqC = 16   // centroids per subspace codebook

  private val pqCodesCache =
    graft.util.SessionCaches.memo[(SparkSession, String)]("similarity.pqcodes")
  // non-DataFrame values are legal memo entries (evict just drops them);
  // registering here keeps the codebook evictable with everything else
  private val pqCbCache =
    graft.util.SessionCaches.memo[(SparkSession, String)]("similarity.pqcodebook")

  /** Micro-unit integer quantization of the UNIT-NORMALIZED embedding
    * (floor(vᵢ/‖v‖·10⁶)) — normalizing first is how PQ serves cosine
    * ranking (on unit vectors ‖a−b‖² = 2−2cosθ, so Euclidean ADC order
    * IS cosine order); the micro-unit floor makes every PQ distance
    * below EXACT integer arithmetic, so argmin codes and ADC rankings
    * are bit-identical cross-engine (the `embedding_covariance` /
    * `random_projection` trick). The norm chain (ascending square sum →
    * IEEE sqrt → one division) is restated identically in the oracle. */
  private def pqQuantized(s: SparkSession, d: String): DataFrame =
    withNorm(s, d).select(col("vec_id"),
      transform(col("v"), x => floor(x / col("nrm") * lit(1e6)).cast("long")).as("q"))

  /** Sampled codebook: subspace slices of 16 deterministic seed vectors
    * (every 31st vec_id) — faiss's sampling init, kept un-Lloyd'd so the
    * oracle can re-derive it in two CTEs. Driver footprint: 16×64 longs
    * (8 KB), the same documented kilobyte-metadata collect as the IVF
    * centroids. */
  private def pqCodebook(s: SparkSession, d: String): Array[Array[Array[Long]]] =
    pqCbCache.getOrElseUpdate((s, d), {
      val seeds = pqQuantized(s, d).filter(col("vec_id") % 31 === 0)
        .orderBy("vec_id").limit(PqC)
        .collect().map(_.getSeq[Long](1).toArray)
      require(seeds.length == PqC, s"need $PqC seed vectors, got ${seeds.length}")
      Array.tabulate(PqM, PqC, PqSub)((m, c, j) => seeds(c)(m * PqSub + j))
    })

  /** PRODUCT-QUANTIZATION ANN — the missing member of the ANN family
    * (brute force / LSH / IVF / int8): compress each vector to PqM=8
    * one-byte codes (argmin centroid per subspace), then answer queries
    * by ASYMMETRIC DISTANCE COMPUTATION — the query precomputes its
    * 8×16 distance table once, and scoring a corpus vector is 8 table
    * lookups + adds, touching only the CODES. This is the vector-store
    * scale story PQ exists for: the corpus shrinks 32× (64 floats → 8
    * codes), so RAM that held 3 M raw vectors holds 100 M codes, and
    * the scan is cache-resident integer lookups. The codes table is
    * memoized per (session, dataset) like a persisted PQ index; the
    * query table is broadcast; the corpus never shuffles.
    *
    * Everything is exact integer arithmetic on micro-unit components,
    * so the full approximate result (codes, ADC distances, ranking)
    * hash-gates against the DuckDB restatement — no float divergence
    * possible. Recall vs exact ranking is asserted in SimilaritySpec. */
  /** Flat subspace-major codebook literal (8 KB) — rides the plan like
    * the LSH planes; the pq_* kernels index it directly. */
  private[graft] def pqCbLit(s: SparkSession, d: String): Column = {
    val cb = pqCodebook(s, d)
    typedlit(for {
      m <- 0 until PqM; c <- 0 until PqC; j <- 0 until PqSub
    } yield cb(m)(c)(j))
  }

  /** The stored PQ index (vec_id, codes) — memoized per (session,
    * dataset); also consumed by the streaming serving path
    * ([[graft.streaming.EventsStream]]'s `stream_ann_serve`). */
  private[graft] def pqCodesIndex(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    // The declarative element_at formulation of encode/table/ADC emits
    // ~20k lines of generated Java, trips janino's 64 KB method limit,
    // and silently degrades to interpreted eval (~6 s for the code
    // assignment alone at sf0.1). The pq_* kernels (functions/
    // PqExpressions) are fused codegen loops — same semantics, small
    // bytecode, whole stage stays compiled.
    pqCodesCache.getOrElseUpdate((s, d),
      pqQuantized(s, d).select(col("vec_id"),
        call_function("pq_encode", col("q"), pqCbLit(s, d),
          lit(PqM), lit(PqC), lit(PqSub)).as("codes"))
        .persistOnce())
  }

  def annPqTopK(s: SparkSession, d: String): DataFrame =
    annPqTopKFor(s, d, querySample = None)

  /** [[annPqTopK]] restricted to an optional broadcast query-id sample
    * (per-query independence — same argument as [[annTopKFor]]). PQ ADC
    * scans ALL corpus codes per query, so with the query set at n/100 of
    * the corpus the full run is O(n²/100) BY CONSTRUCTION — the r15 sf10
    * curve flagged it at 15× for a 10× data step, the exact class the
    * anchors were in. The gate therefore runs the seeded budget; the
    * full variant remains the batch twin of the streaming serve path. */
  private def annPqTopKFor(s: SparkSession, d: String,
      querySample: Option[DataFrame]): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val emb = pqQuantized(s, d)
    val cbLit = pqCbLit(s, d)
    val codes = pqCodesIndex(s, d)
    val qs0 = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"),
        call_function("pq_table", col("q"), cbLit,
          lit(PqM), lit(PqC), lit(PqSub)).as("qtab"))
    val qs = querySample.fold(qs0)(sample =>
      qs0.join(broadcast(sample), Seq("query_id"), "left_semi"))
    // Rank with the native bounded top-K aggregate (functions/TopKMin),
    // not a window: the window formulation shuffles and sorts EVERY
    // (query, candidate) pair — measured 2-3 s of the query's 3.5 s at
    // sf0.1, 25M rows through one exchange — and the typed Aggregator
    // alternative pays an equal encoder tax deserializing those rows.
    // The TypedImperativeAggregate evaluates (adist, vec_id) straight
    // off the InternalRow into a K-entry buffer, so only ≤ K rows per
    // query per partition reach the shuffle.
    // Score INSIDE the join projection, not inside the aggregate: with
    // >128 groups ObjectHashAggregate falls back to SORT-based
    // aggregation, which sorts its CHILD's rows — and a child row that
    // still carries the 2 KB qtab lookup table (plus codes) turns the
    // n·q candidate set into a terabyte-scale spill at sf10 (the r14
    // 16 GB probe OOM'd exactly here, in the spill read-ahead). Scored
    // first, the aggregation input is a 24-byte (query_id, dist,
    // vec_id) row — the same ship-scalars-not-payloads rule as the r13
    // LSH candidate fix (Dedup.scala).
    codes.join(broadcast(qs), col("vec_id") =!= col("query_id"))
      .select(col("query_id"),
        call_function("pq_adc", col("qtab"), col("codes"),
          lit(PqM), lit(PqC)).as("adist"),
        col("vec_id"))
      .groupBy("query_id")
      .agg(call_function("topk_min",
        col("adist"), col("vec_id"), lit(K)).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.id").as("vec_id"),
        col("col.dist").as("adist"), (col("pos") + 1).cast("int").as("rnk"))
      .orderBy("query_id", "rnk")
  }

  /** The PQ pipeline restated in SQL: quantize, re-derive the sampled
    * codebook, assign codes by windowed argmin, and compute ADC as a
    * join of the corpus codes against the query's per-(m,c) distances
    * (a lookup table IS a join on (m, c)). All integers → full hash
    * check of an approximate index, codes and all. */
  val annPqOracle: String = s"""
WITH emb0 AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
emb AS (
  SELECT vec_id, list_transform(v, x -> CAST(floor(
           x / sqrt(CAST(list_sum(list_transform(v, y -> y * y)) AS DOUBLE))
             * 1000000) AS BIGINT)) AS q
  FROM emb0),
seeds AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1 AS c, q
  FROM emb WHERE vec_id % 31 = 0 ORDER BY vec_id LIMIT $PqC),
ms AS (SELECT unnest(generate_series(0, ${PqM - 1})) AS m),
dists AS (
  SELECT e.vec_id, ms.m, s.c,
         list_sum(list_transform(generate_series(1, $PqSub),
           j -> (e.q[ms.m * $PqSub + j] - s.q[ms.m * $PqSub + j])
              * (e.q[ms.m * $PqSub + j] - s.q[ms.m * $PqSub + j]))) AS d
  FROM emb e, ms, seeds s),
codes AS (
  SELECT vec_id, m, c FROM (
    SELECT vec_id, m, c,
           row_number() OVER (PARTITION BY vec_id, m ORDER BY d, c) AS r
    FROM dists) t
  WHERE r = 1),
adist AS (
  SELECT qd.vec_id AS query_id, co.vec_id, CAST(sum(qd.d) AS BIGINT) AS adist
  FROM codes co JOIN dists qd ON qd.m = co.m AND qd.c = co.c
  WHERE qd.vec_id % 100 = 0 AND qd.vec_id <> co.vec_id
  GROUP BY 1, 2),
ranked AS (
  SELECT query_id, vec_id, adist,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY adist, vec_id) AS INT) AS rnk
  FROM adist)
SELECT query_id, vec_id, adist, rnk FROM ranked
WHERE rnk <= $K ORDER BY query_id, rnk"""

  /** The GATE variant of [[annPqTopK]] — seeded query budget, same shape
    * as [[annTopKSampled]]. */
  def annPqTopKSampled(s: SparkSession, d: String): DataFrame = {
    val qs = recallQuerySample(withNorm(s, d))
    annPqTopKFor(s, d, Some(qs))
      .crossJoin(broadcast(qs.agg(count(lit(1)).as("sample_q"))))
      .select("query_id", "vec_id", "adist", "rnk", "sample_q")
      .orderBy("query_id", "rnk")
  }

  lazy val annPqSampledOracle: String = s"""
WITH qs AS (
  SELECT vec_id AS query_id FROM embeddings WHERE vec_id % 100 = 0
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $RecallQueryBudget)
SELECT query_id, vec_id, adist, rnk, (SELECT count(*) FROM qs) AS sample_q
FROM ($annPqOracle) t WHERE query_id IN (SELECT query_id FROM qs)
ORDER BY query_id, rnk"""

  // ---- IVF-PQ: the composed industrial index --------------------------

  private val ivfpqIndexCache =
    graft.util.SessionCaches.memo[(SparkSession, String)]("similarity.ivfpq")

  /** IVF-PQ ANN — the two scale levers COMPOSED, which is the shape
    * every production vector store (faiss IVFPQ, ScaNN, Milvus) actually
    * ships: the IVF coarse quantizer makes the SCAN sublinear (probe
    * nprobe of NumCentroids Voronoi cells ≈ nprobe/NumCentroids of the
    * corpus), and PQ makes the per-candidate cost and MEMORY footprint
    * tiny (8 one-byte codes + a cell id per vector — the index for 100 M
    * vectors fits where 3 M raw floats did). Scoring is the same ADC
    * lookup as [[annPqTopK]], restricted to the probed cells' members;
    * global (non-residual) codebooks, i.e. faiss `by_residual=false`.
    *
    * Everything stays exact-integer / fixed-point deterministic, so the
    * composed approximate index — Lloyd cells, probe sets, codes, ADC
    * ranks — hash-gates against the SQL restatement end to end. */
  def annIvfPqTopK(s: SparkSession, d: String, nprobe: Int = NProbe): DataFrame =
    annIvfPqTopKFor(s, d, nprobe, querySample = None)

  /** [[annIvfPqTopK]] restricted to an optional broadcast query sample —
    * the same per-query-independence argument as [[annTopKFor]]. */
  private def annIvfPqTopKFor(s: SparkSession, d: String, nprobe: Int,
      querySample: Option[DataFrame]): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val emb = withNorm(s, d)
    val cents = lloydCentroidsCached(s, d, emb)
    val cb = pqCodebook(s, d)
    val cbLit = typedlit(for {
      m <- 0 until PqM; c <- 0 until PqC; j <- 0 until PqSub
    } yield cb(m)(c)(j))
    val quant = transform(col("v"), x => floor(x / col("nrm") * lit(1e6)).cast("long"))
    // the stored index: (vec_id, cell, codes) — built once per corpus
    // version, memoized like the centroid table and the PQ codes
    val indexed = ivfpqIndexCache.getOrElseUpdate((s, d),
      emb.withColumn("cell",
          array_max(cellScores(s, col("v"), cents)).getField("cid"))
        .withColumn("q", quant)
        .select(col("vec_id"), col("cell"),
          call_function("pq_encode", col("q"), cbLit,
            lit(PqM), lit(PqC), lit(PqSub)).as("codes"))
        .persistOnce())
    val q0 = emb.filter(col("vec_id") % 100 === 0)
    val qs = querySample.fold(q0)(smp => q0.join(
        broadcast(smp.withColumnRenamed("query_id", "vec_id")), Seq("vec_id"), "left_semi"))
      .withColumn("q", quant)
      .select(col("vec_id").as("query_id"),
        call_function("pq_table", col("q"), cbLit,
          lit(PqM), lit(PqC), lit(PqSub)).as("qtab"),
        explode(slice(reverse(array_sort(cellScores(s, col("v"), cents))), 1, nprobe)
          .getField("cid")).as("probe_cell"))
    // score in the join projection — see annPqTopK's fallback-sort note
    indexed.join(broadcast(qs),
        col("cell") === col("probe_cell") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"),
        call_function("pq_adc", col("qtab"), col("codes"),
          lit(PqM), lit(PqC)).as("adist"),
        col("vec_id"))
      .groupBy("query_id")
      .agg(call_function("topk_min",
        col("adist"), col("vec_id"), lit(K)).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.id").as("vec_id"),
        col("col.dist").as("adist"), (col("pos") + 1).cast("int").as("rnk"))
      .orderBy("query_id", "rnk")
  }

  /** The GATE variant of [[annIvfPqTopK]] — seeded query budget (the r15
    * decade probe measured the full gate at 8.0× for a 3× data step,
    * the same fixed-centroid O(n²·nprobe/C/100) class as
    * [[annIvfTopKSampled]]'s). */
  def annIvfPqTopKSampled(s: SparkSession, d: String): DataFrame = {
    val qs = recallQuerySample(withNorm(s, d))
    annIvfPqTopKFor(s, d, NProbe, Some(qs))
      .crossJoin(broadcast(qs.agg(count(lit(1)).as("sample_q"))))
      .select("query_id", "vec_id", "adist", "rnk", "sample_q")
      .orderBy("query_id", "rnk")
  }

  lazy val annIvfPqSampledOracle: String = s"""
WITH qs AS (
  SELECT vec_id AS query_id FROM embeddings WHERE vec_id % 100 = 0
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $RecallQueryBudget)
SELECT query_id, vec_id, adist, rnk, (SELECT count(*) FROM qs) AS sample_q
FROM ($annIvfPqOracle) t WHERE query_id IN (SELECT query_id FROM qs)
ORDER BY query_id, rnk"""

  /** The composed index restated in SQL: the IVF CTE chain (seeds →
    * unrolled Lloyd rounds → assignment → probe sets, verbatim from
    * [[annIvfOracle]]) feeding the PQ CTE chain (quantize → sampled
    * codebook → windowed-argmin codes → ADC-as-join, verbatim from
    * [[annPqOracle]]), joined on the probed cells. */
  lazy val annIvfPqOracle: String = {
    def iter(k: Int): String = s"""
s$k AS (SELECT e.vec_id, c.cid, list_dot_product(e.v, c.cv) AS score
        FROM emb e CROSS JOIN c${k}n c),
a$k AS (SELECT vec_id, cid AS cell FROM (
          SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
            ORDER BY score DESC, cid DESC) AS rn FROM s$k) t WHERE rn = 1),
c${k + 1} AS (SELECT cell AS cid, list(m ORDER BY dim) AS cv FROM (
          SELECT a.cell, d.i AS dim,
                 sum(CAST(floor(e.v[d.i] * 1000000) AS BIGINT)) / (1000000.0 * count(*)) AS m
          FROM a$k a JOIN emb e USING (vec_id) CROSS JOIN dims d
          GROUP BY a.cell, d.i) t GROUP BY cell),
c${k + 1}n AS (SELECT cid, list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv))) AS cv
        FROM c${k + 1}),"""
    val iters = (0 until LloydIters).map(iter).mkString
    val T = LloydIters
    s"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
dims AS (SELECT unnest(generate_series(1, $Dim)) AS i),
cent AS (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT $NumCentroids),
c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, v AS cv FROM cent),
c0n AS (SELECT cid, list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv))) AS cv FROM c0),$iters
sF AS (SELECT e.vec_id, c.cid, list_dot_product(e.v, c.cv) AS score
       FROM emb e CROSS JOIN c${T}n c),
assigned AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid DESC) AS rn
    FROM sF) t WHERE rn = 1),
qprobe AS (
  SELECT vec_id AS query_id, cid AS probe_cell FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid DESC) AS rn
    FROM sF WHERE vec_id % 100 = 0) t WHERE rn <= $NProbe),
qq AS (
  SELECT vec_id, list_transform(v, x -> CAST(floor(
           x / sqrt(CAST(list_sum(list_transform(v, y -> y * y)) AS DOUBLE))
             * 1000000) AS BIGINT)) AS q
  FROM emb),
seeds AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1 AS c, q
  FROM qq WHERE vec_id % 31 = 0 ORDER BY vec_id LIMIT $PqC),
ms AS (SELECT unnest(generate_series(0, ${PqM - 1})) AS m),
pqd AS (
  SELECT e.vec_id, ms.m, s.c,
         list_sum(list_transform(generate_series(1, $PqSub),
           j -> (e.q[ms.m * $PqSub + j] - s.q[ms.m * $PqSub + j])
              * (e.q[ms.m * $PqSub + j] - s.q[ms.m * $PqSub + j]))) AS d
  FROM qq e, ms, seeds s),
codes AS (
  SELECT vec_id, m, c FROM (
    SELECT vec_id, m, c,
           row_number() OVER (PARTITION BY vec_id, m ORDER BY d, c) AS r
    FROM pqd) t
  WHERE r = 1),
adist AS (
  SELECT p.query_id, a.vec_id, CAST(sum(qd.d) AS BIGINT) AS adist
  FROM qprobe p
  JOIN assigned a ON a.cell = p.probe_cell AND a.vec_id <> p.query_id
  JOIN codes co ON co.vec_id = a.vec_id
  JOIN pqd qd ON qd.vec_id = p.query_id AND qd.m = co.m AND qd.c = co.c
  GROUP BY 1, 2),
ranked AS (
  SELECT query_id, vec_id, adist,
         CAST(row_number() OVER (PARTITION BY query_id
           ORDER BY adist, vec_id) AS INT) AS rnk
  FROM adist)
SELECT query_id, vec_id, adist, rnk FROM ranked
WHERE rnk <= $K ORDER BY query_id, rnk"""
  }

  // ------------------------------------------------- hard-negative mining

  /** Hard-negative mining for contrastive training — for every anchor,
    * the highest-cosine neighbor that is NOT a near-duplicate (cosine
    * below the 0.95 duplicate threshold): the negatives near the
    * decision boundary that make a contrastive objective actually
    * learn. Complements [[graft.ops.CorpusOps.inbatchNegatives]] (cheap
    * RANDOM negatives from the batch dealer) with the expensive curated
    * kind, and it is pure composition: one filter + one per-anchor rank
    * over the memoized [[knnGraph]] edge set, so its marginal cost at
    * 100 TB is a scan of k·n edge rows — the ANN index is the corpus
    * artifact paying for it. Anchors whose every bucket-mate is a
    * near-dup (or who collided with nothing) emit no row, exactly
    * mirrored in the oracle. */
  def hardNegatives(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("vec_a").orderBy(desc("cosine"), asc("vec_b"))
    knnGraph(s, d, 3)
      .filter(col("cosine") < 0.95)
      .withColumn("hn_rnk", row_number().over(w))
      .filter(col("hn_rnk") === 1)
      .select(col("vec_a").as("anchor"), col("vec_b").as("hard_neg"), col("cosine"))
      .orderBy("anchor")
  }

  val hardNegativesOracle: String = s"""
WITH knn AS (${knnGraphOracle()}),
nd AS (
  SELECT vec_a, vec_b, cosine,
         row_number() OVER (PARTITION BY vec_a ORDER BY cosine DESC, vec_b) AS hn_rnk
  FROM knn WHERE cosine < 0.95)
SELECT vec_a AS anchor, vec_b AS hard_neg, cosine
FROM nd WHERE hn_rnk = 1 ORDER BY anchor"""

  // ------------------------------------------------ reciprocal-rank fusion

  /** Hybrid retrieval by reciprocal-rank fusion (Cormack et al. 2009):
    * the SPARSE lexical ranking ([[graft.ops.TextOps.sparseRetrieval]],
    * tf·idf over shared terms) and the DENSE ranking (the memoized
    * [[knnGraph]] cosine neighbors) are fused per query as
    * Σ 1/(60+rank) — here ⌊10⁶/(60+rank)⌋ per contributor so the fused
    * score is exact BIGINT and hash-gates; with ranks ≤ 5 the floor
    * gaps far exceed any tie the true ratios could flip, so the fused
    * ORDER matches the textbook formula. The production RAG shape:
    * rankers run independently (both already bounded and indexed), the
    * fusion is a full-outer join on (query, candidate) — candidate-list
    * sized, trivially small next to either index. */
  def rrfFusion(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sparse = graft.ops.TextOps.sparseRetrieval(s, d)
      .select(col("query_id"), col("doc_id").as("cand"), col("rnk").as("r_sparse"))
    val dense = knnGraph(s, d, 3).filter(col("vec_a") % 100 === 0)
      .select(col("vec_a").as("query_id"), col("vec_b").as("cand"),
        col("rnk").as("r_dense"))
    val w = Window.partitionBy("query_id").orderBy(desc("rrf"), asc("cand"))
    sparse.join(dense, Seq("query_id", "cand"), "full")
      .withColumn("rrf", expr(
        "coalesce(1000000 DIV (60 + r_sparse), 0L) + coalesce(1000000 DIV (60 + r_dense), 0L)"))
      .withColumn("in_sparse", col("r_sparse").isNotNull)
      .withColumn("in_dense", col("r_dense").isNotNull)
      .withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= 5)
      .select("query_id", "cand", "rrf", "in_sparse", "in_dense", "rnk")
      .orderBy("query_id", "rnk")
  }

  lazy val rrfFusionOracle: String = s"""
WITH sp AS (
  SELECT query_id, doc_id AS cand, rnk AS r_sparse
  FROM (${graft.ops.TextOps.sparseRetrievalOracle}) t),
dn AS (
  SELECT vec_a AS query_id, vec_b AS cand, rnk AS r_dense
  FROM (${knnGraphOracle()}) t WHERE vec_a % 100 = 0),
f AS (
  SELECT coalesce(sp.query_id, dn.query_id) AS query_id,
         coalesce(sp.cand, dn.cand) AS cand,
         coalesce(1000000 // (60 + sp.r_sparse), 0)
           + coalesce(1000000 // (60 + dn.r_dense), 0) AS rrf,
         sp.r_sparse IS NOT NULL AS in_sparse,
         dn.r_dense IS NOT NULL AS in_dense
  FROM sp FULL OUTER JOIN dn
    ON sp.query_id = dn.query_id AND sp.cand = dn.cand)
SELECT query_id, cand, CAST(rrf AS BIGINT) AS rrf, in_sparse, in_dense, rnk
FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY rrf DESC, cand) AS INT) AS rnk
  FROM f) r
WHERE rnk <= 5 ORDER BY query_id, rnk"""

  // ------------------------------------------------- index quality eval

  /** Query budget of the recall evaluation: exact ground truth is
    * O(corpus) PER QUERY, so evaluating every query made the gate
    * O(n·q) = O(n²/100) — quadratic at sf10 (r13 verdict #4). A fixed
    * seeded sample keeps it O(corpus × budget) at any scale; 64 queries
    * bound the recall estimate's standard error at ~ sqrt(r(1-r)/64)
    * ≤ 0.063, plenty for a ≥0.9 contract. */
  val RecallQueryBudget = 64

  /** The seeded query sample: the `RecallQueryBudget` query ids with the
    * smallest md5 of their decimal rendering — a deterministic,
    * engine-neutral shuffle (both engines md5 the identical bytes), so
    * the oracle states the identical sample in SQL. */
  /** The seeded sample against a dataset dir — for gates OUTSIDE this
    * object (the streaming serve path). */
  private[graft] def seededQuerySample(s: SparkSession, d: String): DataFrame =
    recallQuerySample(withNorm(s, d))

  private def recallQuerySample(emb: DataFrame): DataFrame =
    querySet(emb)
      .select(col("query_id"), md5(col("query_id").cast("string")).as("__ord"))
      .orderBy(col("__ord"), col("query_id"))
      .limit(RecallQueryBudget)
      .select("query_id")

  /** Index-quality evaluation as a first-class operator: recall@5 of the
    * LSH index against the exact ranking, per query and in exact ppm —
    * the nightly "is my ANN index still good after the last ingest"
    * job a production retrieval system schedules, not just a unit-test
    * assertion (SimilaritySpec's recall checks pin planted-cluster
    * cases; THIS runs the real corpus end to end, and because both
    * rankings are deterministic the evaluation itself hash-gates).
    * Ground truth stays EXACT brute force, but only for the seeded
    * [[recallQuerySample]] — O(corpus × budget), never O(n·q); the
    * sample size rides in the output schema (`sample_q`) so a recall
    * number can't silently detach from its support. Left-join +
    * zero-fill so a query whose buckets collided with nothing reports
    * recall 0 instead of vanishing. */
  def annRecallEval(s: SparkSession, d: String): DataFrame = {
    val emb = withNorm(s, d)
    val qs = recallQuerySample(emb)
    val exact = annTopKFor(s, d, Some(qs)).select(col("query_id"), col("vec_id"))
    val effBits = effBitsFor(Tables.embeddings(s, d).count())
    val lsh = annLshWithPlanes(s, d, adaptivePlanes.map(_.take(effBits)), Some(qs))
      .select(col("query_id"), col("vec_id"))
    val overlap = exact.join(lsh, Seq("query_id", "vec_id"))
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    exact.groupBy("query_id").agg(count(lit(1)).as("k"))
      .join(overlap, Seq("query_id"), "left")
      .na.fill(0L, Seq("hits"))
      .withColumn("recall_ppm", expr("hits * 1000000L DIV k"))
      .crossJoin(broadcast(qs.agg(count(lit(1)).as("sample_q"))))
      .select("query_id", "k", "hits", "recall_ppm", "sample_q")
      .orderBy("query_id")
  }

  /** The oracle computes the FULL exact/LSH rankings (DuckDB at oracle
    * scale — sf0.01 — is fine with O(n·q)) and restricts to the same
    * seeded sample: per-query results are independent, so sample-then-
    * rank ≡ rank-then-sample, and the hash pins the engine's sampled
    * path against the oracle's filtered full run. */
  lazy val annRecallEvalOracle: String = s"""
WITH qs AS (
  SELECT vec_id AS query_id FROM embeddings WHERE vec_id % 100 = 0
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $RecallQueryBudget),
ex AS (SELECT query_id, vec_id FROM ($annTopKOracle) t
       WHERE query_id IN (SELECT query_id FROM qs)),
ls AS (SELECT query_id, vec_id FROM ($annLshOracle) t
       WHERE query_id IN (SELECT query_id FROM qs)),
hits AS (
  SELECT ex.query_id, count(*) AS hits
  FROM ex JOIN ls ON ex.query_id = ls.query_id AND ex.vec_id = ls.vec_id
  GROUP BY 1),
k AS (SELECT query_id, count(*) AS k FROM ex GROUP BY 1)
SELECT k.query_id, k.k, CAST(coalesce(hits.hits, 0) AS BIGINT) AS hits,
       CAST(coalesce(hits.hits, 0) * 1000000 // k.k AS BIGINT) AS recall_ppm,
       (SELECT count(*) FROM qs) AS sample_q
FROM k LEFT JOIN hits ON k.query_id = hits.query_id
ORDER BY k.query_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rrf_fusion"          -> (rrfFusion _),
    "ann_recall_eval"     -> (annRecallEval _),
    "hard_negatives"      -> (hardNegatives _),
    "ann_topk_bruteforce" -> (annTopKSampled _),
    "ann_topk_int8"       -> (annInt8TopKSampled _),
    "ann_topk_lsh"        -> (annLshTopK _),
    "ann_topk_ivf"        -> (annIvfTopKSampled _),
    "ann_topk_pq"         -> (annPqTopKSampled _),
    "ann_topk_ivfpq"      -> (annIvfPqTopKSampled _),
    "knn_graph"           -> ((s: SparkSession, d: String) => knnGraph(s, d))
  )

  val oracleSql: Map[String, String] = Map(
    "rrf_fusion"          -> rrfFusionOracle,
    "ann_recall_eval"     -> annRecallEvalOracle,
    "hard_negatives"      -> hardNegativesOracle,
    "ann_topk_bruteforce" -> annTopKSampledOracle,
    "ann_topk_int8"       -> annInt8SampledOracle,
    "ann_topk_lsh"        -> annLshOracle,
    "ann_topk_ivf"        -> annIvfSampledOracle,
    "ann_topk_pq"         -> annPqSampledOracle,
    "ann_topk_ivfpq"      -> annIvfPqSampledOracle,
    "knn_graph"           -> knnGraphOracle()
  )
}
