package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Similarity, TextOps}

class ExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  test("ngram jaccard finds the planted near-duplicates") {
    val pairs = Dedup.ngramJaccard(spark, sf).collect()
    assert(pairs.length >= 10, s"expected planted near-dups, got ${pairs.length}")
    assert(pairs.forall(_.getDouble(2) >= 0.5))
  }

  test("minhash-LSH verified output equals brute-force jaccard at 0.9") {
    val lsh = Dedup.minhashLsh(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Dedup.ngramJaccard(spark, sf, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == brute, s"lsh-only=${lsh -- brute} brute-only=${brute -- lsh}")
  }

  test("simhash: planted near-dup pairs are hamming-close, random pairs are not") {
    val fp = Dedup.simhash(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap // (hi, lo)
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    val dups = Dedup.ngramJaccard(spark, sf, 0.9).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(dups.nonEmpty)
    val dupHam = dups.map { case (a, b) => ham(fp(a), fp(b)) }
    // near-identical word multisets → nearly identical simhash. The bound
    // scales with the fingerprint width (expected Hamming of a fixed
    // similarity level is ∝ bits): 6 of 32 bits in the r3 fingerprint,
    // 12 of 60 in the r13 one, 24 of 120 in the r17 one — random pairs
    // sit near bits/2 = 60, so the separation certified is unchanged.
    val bound = Dedup.SimhashBits / 5
    assert(dupHam.forall(_ <= bound), s"dup hamming distances: ${dupHam.toSeq}")
    val ids = fp.keys.toArray.sorted
    val randHam = ids.take(50).sliding(2, 2).collect { case Array(a, b) if !dups.contains((a, b)) =>
      ham(fp(a), fp(b))
    }.toSeq
    assert(randHam.count(_ > bound) > randHam.length / 2, s"random hamming: $randHam")
  }

  test("simhash v2 banding: any ≤3-bit flip over 120 bits leaves one band untouched") {
    // the d≤3 recall pin the 128-bit upgrade was asked to carry: the
    // banding arithmetic (2 bands × 30 bits per 60-bit half) must keep
    // the pigeonhole guarantee EXACTLY — every fingerprint pair within
    // Hamming 3 shares at least one of the 4 band values. Property-test
    // the band split itself over random fingerprints and random ≤3-bit
    // flips (the oracle's brute-force all-pairs scan then certifies the
    // same property end-to-end on the corpus).
    val rng = new scala.util.Random(0x51a17)
    val mask30 = (1L << 30) - 1
    def bandsOf(hi: Long, lo: Long): Seq[Long] =
      Seq(lo & mask30, (lo >> 30) & mask30, hi & mask30, (hi >> 30) & mask30)
    (1 to 2000).foreach { _ =>
      val lo = rng.nextLong() & ((1L << 60) - 1)
      val hi = rng.nextLong() & ((1L << 60) - 1)
      val nFlips = 1 + rng.nextInt(3)
      val flips = Seq.fill(nFlips)(rng.nextInt(120))
      var (lo2, hi2) = (lo, hi)
      flips.foreach { b =>
        if (b < 60) lo2 ^= (1L << b) else hi2 ^= (1L << (b - 60))
      }
      val shared = bandsOf(hi, lo).zip(bandsOf(hi2, lo2)).count { case (x, y) => x == y }
      assert(shared >= 1,
        s"pigeonhole violated: flips=$flips hi=$hi lo=$lo — banding split is wrong")
    }
  }

  test("LSH and IVF ANN achieve usable recall vs brute force") {
    val brute = Similarity.annTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.annLshTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.annIvfTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshRecall = (brute & lsh).size.toDouble / brute.size
    val ivfRecall = (brute & ivf).size.toDouble / brute.size
    info(f"recall@${Similarity.K}: lsh=$lshRecall%.2f ivf=$ivfRecall%.2f")
    // uniform vectors have no true neighbor structure, so this is a floor
    // on the bucketing machinery, not an ANN quality claim (that contract
    // lives in SimilaritySpec on planted clusters, at >= 0.9 — measured
    // 1.000). The LSH candidate fraction here is ~2·7/64 ≈ 22% of the
    // corpus, so a BROKEN bucketing scores ~0.22 (random candidates)
    // while working probing of mildly-correlated top-5 neighbors lands
    // 0.44-0.60 depending on the plane draw (0.60 with the r3 planes,
    // 0.48 with the r13 prefix-stable splitmix planes). The floor sits
    // between the two regimes.
    assert(lshRecall >= 0.4, f"LSH recall $lshRecall%.2f too low")
    assert(ivfRecall >= 0.5, f"IVF recall $ivfRecall%.2f too low")
  }

  test("dedup clusters map every paired doc to its component minimum") {
    val pairs = Dedup.ngramJaccard(spark, sf, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val cl = Dedup.clusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl.nonEmpty)
    // both endpoints of every dup pair share a root, and roots are minima.
    // cl.get (not apply): if LSH banding missed an exact-jaccard pair, a
    // clear assertion beats a bare NoSuchElementException.
    pairs.foreach { case (a, b) =>
      (cl.get(a), cl.get(b)) match {
        case (Some(ra), Some(rb)) =>
          assert(ra == rb, s"pair ($a,$b) split across clusters")
          assert(ra <= a && ra <= b)
        case _ => fail(s"pair ($a,$b) missing from clusters — LSH recall gap?")
      }
    }
    assert(cl.forall { case (n, root) => root <= n })
  }

  test("simhash banding is a bucketed equi-join, never an all-pairs product") {
    val df = Dedup.simhashPairs(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoopJoin"),
      s"all-pairs join in simhash banding:\n$plan")
    // candidates flow through the (band_idx, band_val) equi-join
    assert(plan.contains("band_idx") && plan.contains("band_val"))
  }

  test("hot-shingle DF cap is active: no surviving shingle exceeds the cap") {
    val nDocs = Tables.documents(spark, sf).count()
    val cap = math.max(Dedup.MinShingleDfCap,
      math.floor(Dedup.MaxShingleDfFrac * nDocs).toLong)
    val df = Dedup.shingleTable(spark, sf)
      .select(explode(col("sh")).as("h"))
      .groupBy("h").count()
    // every shingle that survives into the inverted-index join is cold...
    assert(df.agg(max("count")).head().getLong(0) <= cap)
    // ...and the cap genuinely fired on this dataset (45 hot shingles at
    // sf0.001) — the O(n²) self-join blowup path is exercised, not latent
    val rawDistinct = Tables.documents(spark, sf)
      .filter(size(split(col("text"), " ")) >= 3)
      .select(explode(array_distinct(transform(
        graft.ops.Ngrams.wordNgrams(col("text"), 3), x => xxhash64(x)))).as("h"))
      .distinct().count()
    assert(df.count() < rawDistinct, "cap dropped nothing — dataset has no hot shingles")
  }

  test("cosine pairs: block plan fans out small corpora and caps replication") {
    // a corpus under one default block must not collapse to a single task
    assert(Dedup.cosineNumBlocks(500, 1 << 16, 4) > 1)
    assert(Dedup.cosineNumBlocks(2000, 1 << 16, 32) > 1)
    // large corpora: replication factor stays bounded by configured blockRows
    assert(Dedup.cosineNumBlocks(10_000_000L, 1 << 16, 32) ==
      math.ceil(1e7 / (1 << 16)).toInt)
    // degenerate corpus: one block, never zero
    assert(Dedup.cosineNumBlocks(10, 1 << 16, 32) == 1)
  }

  test("cosine pairs: distributed lineage (no driver collect / corpus broadcast)") {
    val df = Dedup.cosinePairs(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // round-1's version collected the corpus to the driver and re-shipped it
    // inside a closure; the block-pair design must instead shuffle on the
    // block key and never broadcast or re-localize the corpus
    assert(!plan.contains("BroadcastExchange"), s"corpus broadcast in plan:\n$plan")
    assert(!plan.contains("LocalTableScan"), s"driver-side relation in plan:\n$plan")
    assert(plan.contains("hashpartitioning"), s"expected shuffle on block key:\n$plan")

    // and the block path is exactly brute force (test-side collect is fine)
    val vecs = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) v")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var k = 0
      while (k < a.length) { d += a(k) * b(k); na += a(k) * a(k); nb += b(k) * b(k); k += 1 }
      java.math.BigDecimal.valueOf(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    val brute = (for {
      i <- vecs.indices.iterator
      j <- (i + 1) until vecs.length
      c = cos(vecs(i)._2, vecs(j)._2) if c >= 0.4
    } yield (vecs(i)._1, vecs(j)._1, c)).toSet
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == brute, s"block-pair != brute: only-block=${got -- brute} only-brute=${brute -- got}")
  }

  test("text quality score is bounded and fingerprint is order-sensitive") {
    val q = TextOps.quality(spark, sf)
    assert(q.where(col("quality_score") < 0 || col("quality_score") > 1).count() == 0)
    val fps = TextOps.fingerprint(spark, sf).limit(100).collect().map(_.getLong(1))
    assert(fps.distinct.length > 90, "fingerprints should be near-unique")
  }
}
