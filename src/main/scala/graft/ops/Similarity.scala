package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

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
  val Bits = 4
  val Dim = 64
  val Seed = 42L

  private def dot(s: SparkSession, a: Column, b: Column): Column =
    graft.functions.GraftFunctions.arrayDot(s, a, b)

  private def withNorm(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    df.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot(s, col("v"), col("v"))))
  }

  /** Query set: every 100th vector — small by construction, broadcast. */
  private def querySet(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))

  /** Exact cosine top-K per query (ranked on the 6dp-rounded cosine with a
    * vec_id tie-break so both engines rank identically). */
  def annTopK(s: SparkSession, d: String): DataFrame = {
    val emb = withNorm(Tables.embeddings(s, d))
    val q = querySet(emb)
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

  /** Seeded random hyperplanes, generated on the driver (Bits × Dim doubles
    * — trivially broadcastable at any scale). */
  private lazy val planes: Array[Array[Double]] = {
    val rng = new scala.util.Random(Seed)
    Array.fill(Bits, Dim)(rng.nextGaussian())
  }

  private def bucketOf(s: SparkSession, v: Column): Column =
    (0 until Bits).map { b =>
      when(dot(s, v, typedlit(planes(b).toSeq)) >= 0, lit(1 << b)).otherwise(lit(0))
    }.reduce(_ + _)

  /** LSH-bucketed approximate top-K: probe own bucket + Hamming-1 buckets,
    * exact-rank the candidates. Oracle-checked (planes pinned as SQL
    * literals); SimilaritySpec asserts recall@K against [[annTopK]]. */
  def annLshTopK(s: SparkSession, d: String): DataFrame = {
    val emb = withNorm(Tables.embeddings(s, d)).withColumn("bucket", bucketOf(s, col("v")))
    val probes = array((lit(0) +: (0 until Bits).map(b => lit(1 << b))): _*)
    val q = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"),
        explode(probes).as("flip"), col("bucket"))
      .withColumn("probe_bucket", col("bucket").bitwiseXOR(col("flip")))
      .drop("bucket", "flip")
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("vec_id"))
    emb.join(broadcast(q),
        col("bucket") === col("probe_bucket") && col("vec_id") =!= col("query_id"))
      .withColumn("cosine", round(dot(s, col("v"), col("qv")) / (col("nrm") * col("qn")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= K)
      .select("query_id", "vec_id", "cosine", "rnk")
      .orderBy("query_id", "rnk")
  }

  /** The LSH oracle mirrors [[annLshTopK]] exactly, with the seeded planes
    * embedded as literal DOUBLE[] arrays (Double.toString round-trips, so
    * DuckDB parses the identical doubles; the sign of the identical dot
    * product then yields the identical bucket). */
  lazy val annLshOracle: String = {
    val cases = (0 until Bits).map { b =>
      val lit = planes(b).mkString("[", ", ", "]")
      s"CASE WHEN list_dot_product(v, $lit) >= 0 THEN ${1 << b} ELSE 0 END"
    }.mkString("\n   + ")
    s"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
b AS (SELECT vec_id, v,
  ($cases) AS bucket
  FROM emb),
q AS (SELECT vec_id AS query_id, v AS qv, bucket AS qb FROM b WHERE vec_id % 100 = 0),
probes AS (
  SELECT query_id, qv, xor(qb, f.flip) AS probe_bucket
  FROM q CROSS JOIN (VALUES (0)${(0 until Bits).map(x => s", (${1 << x})").mkString}) AS f(flip)),
cand AS (
  SELECT query_id, vec_id, round(list_cosine_similarity(v, qv), 6) AS cosine
  FROM b JOIN probes ON bucket = probe_bucket AND vec_id <> query_id),
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

  /** IVF-style ANN: the corpus is Voronoi-partitioned around
    * `NumCentroids` seed centroids (the lowest-id vectors — deterministic,
    * no RNG; a production build would Lloyd-iterate them), each query
    * probes its `NProbe` nearest cells, and only those cells' vectors are
    * exact-ranked. Cell assignment is pure Catalyst: an array of
    * (cosine, cid) structs reduced with array_max (lexicographic struct
    * ordering), so the argmax never leaves codegen. Corpus-side cost per
    * query drops to ~NProbe/NumCentroids of brute force. Oracle-checked
    * (the deterministic index is mirrored in SQL — [[annIvfOracle]]);
    * recall asserted in SimilaritySpec. */
  def annIvfTopK(s: SparkSession, d: String): DataFrame = {
    val emb = withNorm(Tables.embeddings(s, d))
    val centroids = emb.orderBy("vec_id").limit(NumCentroids)
      .select("vec_id", "v").collect()
      .map(r => r.getSeq[Double](1).toArray)
    // pre-normalize centroids so cell assignment is by COSINE, not raw dot:
    // unnormalized seed centroids have differing norms and would pull both
    // corpus and queries toward large-norm cells, imbalancing the index
    val unit = centroids.map { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      c.map(_ / n)
    }
    def cellScores(v: Column): Column = array(unit.zipWithIndex.toIndexedSeq.map {
      case (c, i) => struct(dot(s, v, typedlit(c.toSeq)).as("score"), lit(i).as("cid"))
    }: _*)
    val assigned = emb.withColumn("cell", array_max(cellScores(col("v"))).getField("cid"))
    val q = assigned.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"),
        // probe the NProbe best cells: sort scores desc, take cids
        explode(slice(reverse(array_sort(cellScores(col("v")))), 1, NProbe)
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

  /** Mirrors [[annIvfTopK]] in SQL: same seed centroids (the NumCentroids
    * lowest-id vectors, unit-normalized — both derivable from the data in
    * either engine), same argmax cell assignment (score DESC, cid DESC ties
    * — matching Spark's lexicographic struct array_max), same NProbe probe
    * set, same exact re-rank. Because the index construction is
    * deterministic and cross-engine reproducible, the APPROXIMATE result
    * is hash-checkable, not just rows-only. */
  lazy val annIvfOracle: String = s"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cent AS (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT $NumCentroids),
cent_n AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
         list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS cv
  FROM cent),
scores AS (
  SELECT e.vec_id, c.cid, list_dot_product(e.v, c.cv) AS score
  FROM emb e CROSS JOIN cent_n c),
assigned AS (
  SELECT vec_id, cid AS cell FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid DESC) AS rn
    FROM scores) t WHERE rn = 1),
qprobe AS (
  SELECT vec_id AS query_id, cid AS probe_cell FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cid DESC) AS rn
    FROM scores WHERE vec_id % 100 = 0) t WHERE rn <= $NProbe),
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_topk_bruteforce" -> (annTopK _),
    "ann_topk_lsh"        -> (annLshTopK _),
    "ann_topk_ivf"        -> (annIvfTopK _)
  )

  val oracleSql: Map[String, String] = Map(
    "ann_topk_bruteforce" -> annTopKOracle,
    "ann_topk_lsh"        -> annLshOracle,
    "ann_topk_ivf"        -> annIvfOracle
  )
}
