package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup

/** Skew hardening for the banded dedup joins at 100× (r8 verdict #4):
  * a PLANTED corpus-wide boilerplate phrase — the classic hot-shingle
  * adversary, one stopword-like shingle with document frequency f makes
  * the inverted-index self-join emit f²/2 rows — must be neutralized by
  * the hot-shingle DF cap ([[Dedup.MaxShingleDfFrac]]) BEFORE any join,
  * so that (a) every post-cap shingle's document frequency is ≤ the cap
  * (bounding the per-key fan-out of the n-gram inverted index at cap²),
  * (b) the widest (band_idx, band_val) bucket of the MinHash LSH index
  * is the size of a genuine duplicate cluster, not of the corpus, and
  * (c) recall on the genuinely-planted near-dup pairs is untouched (the
  * cap only drops shingles that carry no discriminative signal).
  *
  * The fixture: 440 docs, ALL sharing a 10-word boilerplate prefix
  * (planted df = corpus size, far over the cap of max(5, 1%·440) = 5),
  * of which 20 pairs are exact near-dups (Jaccard 1.0 after the cap)
  * and 400 are unrelated noise docs with unique bodies.
  */
class SkewBoundSpec extends AnyFunSuite {
  import TestSpark.spark

  private val NPairs = 20
  private val NNoise = 400
  private val NDocs = 2 * NPairs + NNoise
  private val Cap = math.max(Dedup.MinShingleDfCap,
    math.floor(Dedup.MaxShingleDfFrac * NDocs).toLong)

  private val Boiler =
    "all rights reserved contact the site team for full terms today"

  private lazy val dir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_skew").toString
    val rng = new scala.util.Random(0x5ca1ab1e)
    def body(): String =
      Seq.fill(30)(f"w${rng.nextInt(10000000)}%07d").mkString(" ")
    val rows =
      (0 until NPairs).flatMap { p =>
        val b = body()
        Seq((2L * p, s"$Boiler $b"), (2L * p + 1, s"$Boiler $b"))
      } ++ (0 until NNoise).map { i =>
        ((2L * NPairs + i).toLong, s"$Boiler ${body()}")
      }
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("web"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  private def rawTrigramDf = {
    val w = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    w.select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(1, size(ws)-2), " +
          "i -> concat_ws(' ', ws[i-1], ws[i], ws[i+1])))")).as("sh"))
      .groupBy("sh").agg(count(lit(1)).as("df"))
  }

  test("the fixture really plants corpus-wide hot shingles (pre-cap df = n)") {
    val hottest = rawTrigramDf.agg(max("df")).head().getLong(0)
    assert(hottest == NDocs,
      s"planted boilerplate shingles should reach df=$NDocs, got $hottest")
  }

  test("post-cap document frequency of every shingle is <= the cap") {
    val maxDf = Dedup.shingleTable(spark, dir)
      .select(col("doc_id"), explode(col("sh")).as("h"))
      .groupBy("h").agg(count(lit(1)).as("df"))
      .agg(max("df")).head().getLong(0)
    info(s"post-cap max shingle df = $maxDf (cap = $Cap)")
    assert(maxDf <= Cap,
      s"hot-shingle cap failed: a shingle survived with df=$maxDf > $Cap — " +
        "the inverted-index join fan-out is unbounded again")
  }

  test("widest banded LSH bucket is the dup-cluster size, not the corpus") {
    val widest = Dedup.bandedSignatures(Dedup.shingleTable(spark, dir))
      .groupBy("band_idx", "band_val").agg(count(lit(1)).as("width"))
      .agg(max("width")).head().getLong(0)
    info(s"widest (band_idx, band_val) bucket = $widest of $NDocs docs")
    // genuine duplicates SHOULD share buckets (width 2 per planted pair);
    // anything near corpus width would mean the boilerplate leaked into
    // the signatures. Slack of 2× covers band-hash coincidences.
    assert(widest <= 4,
      s"a band bucket reached width $widest — skew leaked through the cap")
  }

  test("recall on the planted near-dup pairs survives the cap") {
    val found = Dedup.minhashLsh(spark, dir, 0.9).collect()
    assert(found.length == NPairs, s"expected $NPairs pairs, got ${found.length}")
    found.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(a + 1 == b && a % 2 == 0, s"unexpected pair ($a, $b)")
      assert(r.getDouble(2) == 1.0, s"capped Jaccard of a planted pair: $r")
    }
  }

  test("simhash banding generates far fewer candidates than all-pairs") {
    // simhash has no shingle cap — its skew story is that band values are
    // slices of md5-derived fingerprints, uniform by construction even
    // when every doc shares boilerplate words. Reproduce the banded
    // candidate generation (the join in Dedup.simhashPairs, pre-Hamming)
    // with deliberately NARROW 8-bit bands of the lo half — 256 buckets
    // is the adversarial shape on this small corpus; the production
    // 30-bit bands only collide less — and bound it against the
    // all-pairs count the banding replaces.
    val fp = Dedup.simhash(spark, dir)
    val bands = fp.select(col("doc_id"), col("simhash_lo"),
      posexplode(array((0 until Dedup.SimhashBands).map { b =>
        shiftright(col("simhash_lo"), b * 8).bitwiseAND(0xff)
      }: _*)).as(Seq("band_idx", "band_val")))
    val l = bands.select(col("doc_id").as("doc_a"), col("band_idx"), col("band_val"))
    val r = bands.select(col("doc_id").as("doc_b"), col("band_idx"), col("band_val"))
    val cands = l.join(r, Seq("band_idx", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct().count()
    val allPairs = NDocs.toLong * (NDocs - 1) / 2
    info(s"banded candidates = $cands of $allPairs all-pairs")
    assert(cands < allPairs / 10,
      s"banding generated $cands candidates of $allPairs all-pairs — " +
        "the candidate join is no longer sub-quadratic on this corpus")
  }
}
