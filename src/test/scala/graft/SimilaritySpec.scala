package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

/** Recall contract for the ANN paths.
  *
  * The uniform synthetic testdata has no real near neighbors (a query's
  * top-5 cosines are ~0.4, barely above the bulk), so no sublinear ANN can
  * score high recall there — the differential gate only pins those results
  * as deterministic. The recall CONTRACT is asserted here, on planted
  * cluster structure where "nearest neighbor" means something: 25 tight
  * clusters of 20 vectors (intra-cluster cosine ≈ 0.95, cross-cluster ≈ 0).
  */
class SimilaritySpec extends AnyFunSuite {
  import TestSpark._

  private lazy val plantedDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_planted").toString
    val rng = new scala.util.Random(7)
    val centers = Array.fill(25, Similarity.Dim)(rng.nextGaussian())
    val rows = (0L until 500L).map { id =>
      val c = centers((id / 20).toInt)
      (id, c.map(x => (x + 0.2 * rng.nextGaussian()).toFloat).toSeq, (id / 20).toInt)
    }
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def topkSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("knnGraph refuses non-float32 source embeddings loudly at plan time") {
    // r15 ADVICE: the staged knn build ships the probe side as float32 —
    // exact only because the source IS float32. Genuine float64 source
    // embeddings would silently perturb cosines; the guard must fail
    // loudly instead of surfacing as an opaque gate-hash mismatch.
    val dir = java.nio.file.Files.createTempDirectory("graft_f64emb").toString
    import spark.implicits._
    (0L until 8L).map(id => (id, Seq.fill(Similarity.Dim)(id.toDouble + 0.5), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val e = intercept[IllegalStateException] {
      graft.ops.Similarity.knnGraph(spark, dir).count()
    }
    assert(e.getMessage.contains("float32") && e.getMessage.contains("DoubleType"),
      s"imprecise float32-guard message: ${e.getMessage}")
  }

  test("LSH ANN reaches recall@5 >= 0.9 on planted clusters") {
    val brute = topkSet(Similarity.annTopK(spark, plantedDir))
    val lsh = topkSet(Similarity.annLshTopK(spark, plantedDir))
    val recall = (brute & lsh).size.toDouble / brute.size
    info(f"planted LSH recall@${Similarity.K}: $recall%.3f")
    assert(recall >= 0.9, f"LSH recall $recall%.3f < 0.9")
  }

  test("recall eval runs on the seeded query sample and reports its support") {
    // r13 verdict #4: the gate is O(corpus × budget), not O(n·q). On the
    // planted data the sampled eval must still certify the ≥0.9 contract.
    val eval = Similarity.annRecallEval(spark, plantedDir).collect()
    val nQueries = 5 // planted: vec_ids 0,100,200,300,400 — all ≤ budget
    assert(eval.length == math.min(nQueries, Similarity.RecallQueryBudget))
    assert(eval.forall(_.getAs[Long]("sample_q") == eval.length),
      "sample_q must state the evaluated sample size")
    val recall = eval.map(_.getAs[Long]("hits")).sum.toDouble /
      eval.map(_.getAs[Long]("k")).sum
    info(f"sampled planted recall@${Similarity.K}: $recall%.3f " +
      s"over ${eval.length} queries")
    assert(recall >= 0.9, f"sampled recall $recall%.3f < 0.9")
    // the sample draws only from the legitimate query population
    assert(eval.forall(_.getAs[Long]("query_id") % 100 == 0))
  }

  test("sampled exact anchors emit exactly the full run's rows for sampled queries") {
    // r14 verdict #3: the GATE anchors run a seeded query budget. Per-query
    // independence means each sampled row must be IDENTICAL to the full
    // run's row (sample-then-rank ≡ rank-then-sample), with sample_q
    // stating the support.
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double, Int)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val fullB = rows(Similarity.annTopK(spark, plantedDir))
    val sampB = Similarity.annTopKSampled(spark, plantedDir)
    val sampBRows = rows(sampB.drop("sample_q"))
    assert(sampBRows.subsetOf(fullB), "sampled bruteforce rows must come from the full run")
    val qids = sampBRows.map(_._1)
    assert(fullB.filter(r => qids.contains(r._1)) == sampBRows,
      "every sampled query must carry its COMPLETE top-k from the full run")
    assert(sampB.select("sample_q").distinct().collect().map(_.getLong(0)).toSeq == Seq(qids.size.toLong))
    val fullI = rows(Similarity.annInt8TopK(spark, plantedDir))
    val sampI = rows(Similarity.annInt8TopKSampled(spark, plantedDir).drop("sample_q"))
    assert(sampI.subsetOf(fullI) &&
      fullI.filter(r => sampI.map(_._1).contains(r._1)) == sampI)
    // PQ got the budget in r15 (its ADC is a full-corpus scan per query,
    // the same O(n·q) class): adist is a Long, so a dedicated extractor
    def prows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Int)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val fullP = prows(Similarity.annPqTopK(spark, plantedDir))
    val sampP = prows(Similarity.annPqTopKSampled(spark, plantedDir).drop("sample_q"))
    assert(sampP.subsetOf(fullP) &&
      fullP.filter(r => sampP.map(_._1).contains(r._1)) == sampP)
    // IVF and IVF-PQ joined the budget in r15 (fixed centroids make the
    // full gate O(n²·nprobe/C/100) — 10.6×/8.0× for a 3× data step)
    val fullV = rows(Similarity.annIvfTopK(spark, plantedDir))
    val sampV = rows(Similarity.annIvfTopKSampled(spark, plantedDir).drop("sample_q"))
    assert(sampV.subsetOf(fullV) &&
      fullV.filter(r => sampV.map(_._1).contains(r._1)) == sampV)
    val fullQ = prows(Similarity.annIvfPqTopK(spark, plantedDir))
    val sampQ = prows(Similarity.annIvfPqTopKSampled(spark, plantedDir).drop("sample_q"))
    assert(sampQ.subsetOf(fullQ) &&
      fullQ.filter(r => sampQ.map(_._1).contains(r._1)) == sampQ)
  }

  test("cosine-pair anchor: seeded corpus sample emits exactly the full run's in-sample pairs") {
    // r15: cosinePairs budgets the CORPUS once it exceeds CosineSampleCap
    // (the pair gate is O(n²) by construction — 443 s cold at sf10). Pair
    // results are independent, so sample-then-pair ≡ pair-then-filter-
    // both-endpoints: a tiny injected cap must reproduce the full run
    // restricted to sampled endpoints, with sample_n stating the support.
    val cap = 64
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.select("vec_a", "vec_b", "cosine").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = pairs(graft.ops.Dedup.cosinePairsUncached(spark, plantedDir, 0.9, 1 << 16))
    val ids = spark.read.parquet(s"$plantedDir/embeddings.parquet")
      .select(col("vec_id"), md5(col("vec_id").cast("string")).as("__ord"))
      .orderBy(col("__ord"), col("vec_id")).limit(cap)
      .collect().map(_.getLong(0)).toSet
    val sampled = graft.ops.Dedup.cosinePairsUncached(spark, plantedDir, 0.9, 1 << 16, cap = cap)
    val expected = full.filter(p => ids(p._1) && ids(p._2))
    assert(expected.nonEmpty, "planted sample must retain some intra-cluster pairs")
    assert(pairs(sampled) == expected,
      "sampled pair set must equal the full run filtered to sampled endpoints")
    assert(sampled.select("sample_n").distinct().collect().map(_.getLong(0)).toSeq
      == Seq(cap.toLong), "sample_n must state the sampled corpus size")
  }

  test("int8-quantized ANN reaches recall@5 >= 0.9 against the exact float ranking") {
    // quantization noise is the only approximation — no bucketing — so the
    // top-k should survive nearly unchanged on BOTH planted and real data
    Seq(plantedDir, sf).foreach { dir =>
      val brute = topkSet(Similarity.annTopK(spark, dir))
      val int8 = topkSet(Similarity.annInt8TopK(spark, dir))
      val recall = (brute & int8).size.toDouble / brute.size
      info(f"int8 recall@${Similarity.K} on $dir: $recall%.3f")
      assert(recall >= 0.9, f"int8 recall $recall%.3f < 0.9 on $dir")
    }
  }

  test("IVF ANN reaches recall@5 >= 0.9 on planted clusters") {
    val brute = topkSet(Similarity.annTopK(spark, plantedDir))
    val ivf = topkSet(Similarity.annIvfTopK(spark, plantedDir))
    val recall = (brute & ivf).size.toDouble / brute.size
    info(f"planted IVF recall@${Similarity.K}: $recall%.3f")
    assert(recall >= 0.9, f"IVF recall $recall%.3f < 0.9")
  }

  test("PQ ANN (codes + ADC): top-5 lies within the exact cosine top-20 on planted clusters") {
    // Exact top-5 agreement is the WRONG metric for PQ on tight clusters:
    // all ~19 members of the query's cluster quantize to the SAME codes,
    // so their ADC distances tie and the tie-break (vec_id) picks a
    // different 5 than exact cosine noise does — measured 0.32 "recall"
    // while every retrieved vector was a true cluster member. The
    // standard ANN-bench metric is recall@k-in-top-R: every PQ top-5 hit
    // must be one of the exact top-20 (which on this data = the cluster).
    val emb = spark.read.parquet(s"$plantedDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na) / math.sqrt(nb)
    }
    val pq = Similarity.annPqTopK(spark, plantedDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pq.nonEmpty)
    val ok = pq.count { case (q, v) =>
      emb.keys.filter(_ != q).toSeq
        .sortBy(id => (-cos(emb(q), emb(id)), id)).take(20).contains(v)
    }
    val frac = ok.toDouble / pq.length
    info(f"PQ top-${Similarity.K} within exact top-20: $frac%.3f")
    assert(frac >= 0.9, f"PQ@5-in-top-20 $frac%.3f < 0.9")
  }

  test("IVF-PQ ANN: top-5 lies within the exact cosine top-20 on planted clusters") {
    // the composed index inherits BOTH approximations (cell pruning +
    // code quantization); the retrieval contract is the same
    // recall@k-in-top-R metric as plain PQ, on the same tie grounds
    val emb = spark.read.parquet(s"$plantedDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na) / math.sqrt(nb)
    }
    val got = Similarity.annIvfPqTopK(spark, plantedDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty)
    val ok = got.count { case (q, v) =>
      emb.keys.filter(_ != q).toSeq
        .sortBy(id => (-cos(emb(q), emb(id)), id)).take(20).contains(v)
    }
    val frac = ok.toDouble / got.length
    info(f"IVF-PQ top-${Similarity.K} within exact top-20: $frac%.3f")
    assert(frac >= 0.9, f"IVF-PQ@5-in-top-20 $frac%.3f < 0.9")
  }

  test("LSH-bucketed cosine dedup recovers >= 0.9 of the exact near-dup pairs on planted clusters") {
    val exact = graft.ops.Dedup.cosinePairs(spark, plantedDir, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = graft.ops.Dedup.cosinePairsLsh(spark, plantedDir, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "planted clusters must contain cosine>=0.9 pairs")
    // LSH output is a SUBSET of exact (candidates are exact-verified)...
    assert(lsh.subsetOf(exact), s"false positives: ${lsh -- exact}")
    // ...and recalls nearly all of it at sublinear candidate cost
    val recall = (exact & lsh).size.toDouble / exact.size
    info(f"planted cosine-LSH dedup recall: $recall%.3f over ${exact.size} exact pairs")
    assert(recall >= 0.9, f"recall $recall%.3f < 0.9")
  }

  test("LSH recall/cost tradeoff behaves monotonically across (bits, tables)") {
    val brute = topkSet(Similarity.annTopK(spark, plantedDir))
    def recallOf(bits: Int, tables: Int): Double = {
      val got = topkSet(Similarity.annLshTopK(spark, plantedDir, bits, tables))
      (brute & got).size.toDouble / brute.size
    }
    // sweep the two knobs; scanned fraction ~ tables*(bits+1)/2^bits
    val sweep = for {
      bits <- Seq(4, 6, 8); tables <- Seq(1, 2)
    } yield ((bits, tables), recallOf(bits, tables))
    sweep.foreach { case ((b, t), r) =>
      info(f"bits=$b tables=$t scan~${t * (b + 1) / math.pow(2, b) * 100}%.0f%% recall=$r%.3f")
    }
    val m = sweep.toMap
    // more tables at fixed bits never hurts recall
    Seq(4, 6, 8).foreach { b =>
      assert(m((b, 2)) >= m((b, 1)), s"second table reduced recall at bits=$b")
    }
    // the shipped operating point stays >= 0.9 on planted structure
    assert(m((Similarity.Bits, Similarity.NumTables)) >= 0.9)
  }

  test("IVF recall grows monotonically with nprobe") {
    val brute = topkSet(Similarity.annTopK(spark, plantedDir))
    val sweep = Seq(1, 2, 4, 8).map { np =>
      val got = topkSet(Similarity.annIvfTopK(spark, plantedDir, np))
      np -> (brute & got).size.toDouble / brute.size
    }
    sweep.foreach { case (np, r) =>
      info(f"nprobe=$np scan~${np * 100.0 / Similarity.NumCentroids}%.0f%% recall=$r%.3f")
    }
    sweep.sliding(2).foreach { case Seq((_, a), (_, b)) =>
      assert(b >= a, s"recall dropped as nprobe grew: $sweep")
    }
    assert(sweep.toMap.apply(Similarity.NProbe) >= 0.9)
  }

  test("Lloyd refinement yields unit centroids and reduces mean assignment distance") {
    val emb = Tables.embeddings(spark, plantedDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cents = Similarity.lloydCentroids(spark, emb)
    assert(cents.nonEmpty && cents.size <= Similarity.NumCentroids)
    cents.foreach { case (_, c) =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9, s"centroid not unit-normalized: $n")
    }
    // refined centroids must explain the corpus better than the raw seeds:
    // mean best-cell cosine strictly improves over the seed index
    def meanBest(cs: Seq[(Int, Array[Double])]): Double = {
      val scored = cs.map { case (_, c) =>
        graft.functions.GraftFunctions.arrayDot(spark, col("v"), typedlit(c.toSeq)) /
          sqrt(graft.functions.GraftFunctions.arrayDot(spark, col("v"), col("v")))
      }
      emb.select(greatest(scored: _*).as("best")).agg(avg("best")).head().getDouble(0)
    }
    val seeds = emb.orderBy("vec_id").limit(Similarity.NumCentroids)
      .select("v").collect().map(_.getSeq[Double](0).toArray)
      .zipWithIndex.map { case (c, i) =>
        val n = math.sqrt(c.map(x => x * x).sum); (i, c.map(_ / n))
      }.toSeq
    assert(meanBest(cents) > meanBest(seeds),
      "Lloyd iterations did not improve centroid fit")
  }
}
