package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Document deduplication suite — the training-data-pipeline extension
  * surface (SURVEY.md §7.5) over the `documents` table.
  *
  * Five strategies, ordered by scale behavior:
  *
  *  - [[exact]]       — hash-groupBy. One shuffle on md5(text); at 100 TB,
  *                      shuffling a 16-byte hash + ids instead of the text
  *                      itself is the whole trick.
  *  - [[ngramJaccard]]— exact all-pairs Jaccard via an inverted shingle
  *                      index (explode → self-equi-join → count). Quadratic
  *                      in docs-per-shingle; correct baseline, not the scale
  *                      path.
  *  - [[minhashLsh]]  — MinHash signatures (64 perms via xxhash64) banded
  *                      16×4; candidates from band-bucket equi-joins only,
  *                      then exact-Jaccard verification of the (tiny)
  *                      candidate set. This is the 100 TB path: cost is
  *                      O(docs × shingles) for signatures + O(candidates)
  *                      verify, never all-pairs. With r=4,b=16 the miss
  *                      probability at j=0.9 is (1-0.9^4)^16 ≈ 2e-3 and at
  *                      the planted j≈0.98 it's ~1e-18, so the verified
  *                      output equals the brute-force oracle.
  *  - [[simhash]]     — 32-bit SimHash fingerprints from md5-derived word
  *                      hashes (engine-neutral, so the oracle can recompute
  *                      them in SQL). Hamming-adjacent fingerprints =
  *                      near-dups; fingerprinting is one narrow pass.
  *  - [[cosinePairs]] — embedding near-dup over `embeddings`: exact
  *                      all-pairs cosine (baseline; the LSH-bucketed scale
  *                      variant lives in Similarity).
  */
object Dedup {

  /** Word 3-gram shingle set, mirrored exactly by the DuckDB oracle:
    * split on single spaces, 1-based sliding windows, distinct. */
  private def withShingles(docs: DataFrame): DataFrame = {
    val ws = split(col("text"), " ")
    docs
      .withColumn("ws", ws)
      .filter(size(col("ws")) >= 3)
      .withColumn("sh", array_distinct(transform(
        sequence(lit(1), size(col("ws")) - 2),
        i => concat_ws(" ",
          element_at(col("ws"), i),
          element_at(col("ws"), (i + 1).cast("int")),
          element_at(col("ws"), (i + 2).cast("int"))))))
      .withColumn("m", size(col("sh")))
      .drop("ws")
  }

  /** Shared oracle CTE: per-doc distinct shingles, exploded. */
  val shingleCte: String = """WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
  WHERE len(string_split(text, ' ')) >= 3),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(ws)-2),
           i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
  FROM w),
ex AS (SELECT doc_id, len(s) AS m, unnest(s) AS sh FROM sh),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.m AS ma, b.m AS mb,
         count(*) AS inter
  FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4)
"""

  // ---- exact ----

  def exact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_id")

  val exactOracle: String = """
SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY md5(text) ORDER BY keep_id"""

  // ---- exact n-gram Jaccard (inverted index) ----

  /** All pairs with Jaccard ≥ `threshold` over 3-gram shingles. */
  def ngramJaccard(s: SparkSession, d: String, threshold: Double = 0.5): DataFrame = {
    val docs = withShingles(Tables.documents(s, d)).select("doc_id", "sh", "m")
    val ex = docs.select(col("doc_id"), col("m"), explode(col("sh")).as("sh1"))
    val a = ex.select(col("doc_id").as("doc_a"), col("m").as("ma"), col("sh1"))
    val b = ex.select(col("doc_id").as("doc_b"), col("m").as("mb"), col("sh1"))
    a.join(b, a("sh1") === b("sh1") && col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b", "ma", "mb")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("ma") + col("mb") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  def ngramJaccardOracle(threshold: Double = 0.5): String = shingleCte + s"""
SELECT doc_a, doc_b, round(inter * 1.0 / (ma + mb - inter), 6) AS jaccard
FROM pairs
WHERE round(inter * 1.0 / (ma + mb - inter), 6) >= $threshold
ORDER BY doc_a, doc_b"""

  // ---- MinHash + LSH (the scale path) ----

  val NumHashes = 64
  val Bands = 16
  val RowsPerBand = 4 // NumHashes / Bands

  /** Near-dup pairs at Jaccard ≥ `threshold`, candidates via banded MinHash,
    * verified exactly. Output is identical to brute force whenever LSH
    * recall at the threshold is ~1 (see class doc), which the oracle checks. */
  def minhashLsh(s: SparkSession, d: String, threshold: Double = 0.9): DataFrame = {
    val docs = withShingles(Tables.documents(s, d)).select("doc_id", "sh", "m")
    val ex = docs.select(col("doc_id"), explode(col("sh")).as("sh1"))
    // 64 min-hashes per doc; xxhash64(seed, shingle) is codegen'd and fast —
    // engine-specific is fine because only the VERIFIED output is compared.
    val minAggs = (0 until NumHashes).map(p => min(xxhash64(lit(p), col("sh1"))).as(s"h$p"))
    val sig = ex.groupBy("doc_id").agg(minAggs.head, minAggs.tail: _*)
    // band value = hash of the band's 4 signature slots
    val bandCols = (0 until Bands).map { bnd =>
      hash((bnd * RowsPerBand until (bnd + 1) * RowsPerBand).map(i => col(s"h$i")): _*)
    }
    val banded = sig.select(col("doc_id"), posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_val")))
    val l = banded.select(col("doc_id").as("doc_a"), col("band_idx"), col("band_val"))
    val r = banded.select(col("doc_id").as("doc_b"), col("band_idx"), col("band_val"))
    val cands = l.join(r, Seq("band_idx", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    // exact verification on the candidate set only
    val withSets = cands
      .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("m").as("ma")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("m").as("mb")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("ma") + col("mb") - col("inter")), 6))
    withSets.filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  // ---- SimHash ----

  val SimhashBits = 32

  /** 32-bit SimHash per document from md5-derived word hashes (first 8 hex
    * chars → int). md5 is available and byte-identical in both engines, so
    * the fingerprints are oracle-reproducible — unlike murmur/xxhash which
    * are engine-specific. One narrow pass: explode words → 32 signed bit
    * sums per doc → reassemble. */
  def simhash(s: SparkSession, d: String): DataFrame = {
    val words = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .withColumn("hv", conv(substring(md5(col("word")), 1, 8), 16, 10).cast("long"))
    val bitAggs = (0 until SimhashBits).map { b =>
      sum(when(shiftright(col("hv"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b")
    }
    val sums = words.groupBy("doc_id").agg(bitAggs.head, bitAggs.tail: _*)
    val fp = (0 until SimhashBits)
      .map(b => when(col(s"b$b") >= 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    sums.select(col("doc_id"), fp.as("simhash")).orderBy("doc_id")
  }

  val simhashOracle: String = {
    val hex2int = "list_sum(list_transform(generate_series(1, 8), " +
      "i -> CAST((strpos('0123456789abcdef', substr(md5(word), i, 1)) - 1) AS BIGINT) " +
      "* CAST(power(16, 8 - i) AS BIGINT)))"
    val bitSums = (0 until SimhashBits)
      .map(b => s"sum(CASE WHEN (hv >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS b$b")
      .mkString(",\n         ")
    val assemble = (0 until SimhashBits)
      .map(b => s"(CASE WHEN b$b >= 0 THEN ${1L << b} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
h AS (SELECT doc_id, $hex2int AS hv FROM w),
b AS (SELECT doc_id,
         $bitSums
      FROM h GROUP BY doc_id)
SELECT doc_id, CAST($assemble AS BIGINT) AS simhash FROM b ORDER BY doc_id"""
  }

  // ---- embedding cosine near-dup (exact baseline) ----

  /** All embedding pairs with cosine ≥ `threshold`. Exact O(n²) baseline —
    * both sides cast float→double and sum sequentially, so Spark and the
    * oracle agree bitwise. The LSH-bucketed variant for scale is in
    * Similarity. */
  def cosinePairs(s: SparkSession, d: String, threshold: Double = 0.4): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x)))
    val a = emb.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
    val b = emb.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("dot", aggregate(zip_with(col("va"), col("vb"), _ * _), lit(0.0), _ + _))
      .withColumn("cosine", round(col("dot") / (col("na") * col("nb")), 6))
      .filter(col("cosine") >= threshold)
      .select("vec_a", "vec_b", "cosine")
      .orderBy("vec_a", "vec_b")
  }

  def cosinePairsOracle(threshold: Double = 0.4): String = s"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])), 6) >= $threshold
ORDER BY vec_a, vec_b"""

  // ---- registration ----

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact"         -> (exact _),
    "dedup_ngram_jaccard" -> ((s: SparkSession, d: String) => ngramJaccard(s, d)),
    "dedup_minhash_lsh"   -> ((s: SparkSession, d: String) => minhashLsh(s, d)),
    "dedup_simhash"       -> (simhash _),
    "dedup_cosine"        -> ((s: SparkSession, d: String) => cosinePairs(s, d))
  )

  val oracleSql: Map[String, String] = Map(
    "dedup_exact"         -> exactOracle,
    "dedup_ngram_jaccard" -> ngramJaccardOracle(),
    "dedup_minhash_lsh"   -> ngramJaccardOracle(0.9),
    "dedup_simhash"       -> simhashOracle,
    "dedup_cosine"        -> cosinePairsOracle()
  )
}
