package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.CorpusOps

class CorpusOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("sequence packing: bins respect capacity, are contiguous in doc order, per shard") {
    val packed = CorpusOps.sequencePack(spark, sf).cache()
    assert(packed.count() == Tables.documents(spark, sf).count())
    // no bin exceeds capacity (every test doc is well under 256 tokens)
    val fills = packed.groupBy("shard", "seq_id").agg(sum("tokens").as("fill"))
    assert(fills.filter(col("fill") > 256).count() == 0)
    // greedy next-fit is maximal: a bin only closes because the next doc
    // would not have fit — fill + first-token-of-next-bin > capacity
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("seq_id")
    val firstTok = packed.groupBy("shard", "seq_id")
      .agg(min(struct(col("doc_id"), col("tokens"))).as("f"))
      .select(col("shard"), col("seq_id"), col("f.tokens").as("first_tokens"))
    val slack = fills.join(
      firstTok.withColumn("seq_id", col("seq_id") - 1), Seq("shard", "seq_id"))
    assert(slack.filter(col("fill") + col("first_tokens") <= 256).count() == 0)
    // seq_id is nondecreasing in doc order within a shard
    val lagged = packed.withColumn("prev",
      lag("seq_id", 1).over(org.apache.spark.sql.expressions.Window
        .partitionBy("shard").orderBy("doc_id")))
    assert(lagged.filter(col("prev") > col("seq_id")).count() == 0)
    packed.unpersist()
  }

  test("repetition ratios are in [0,1] and a permutation-free doc scores 0 dup words") {
    val rep = CorpusOps.repetition(spark, sf).cache()
    Seq("dup_word_ratio", "dup_bigram_ratio", "dup_trigram_ratio").foreach { c =>
      assert(rep.filter(col(c) < 0 || col(c) > 1).count() == 0)
    }
    // ratios are consistent: trigram dups imply bigram dups imply word dups
    // (a repeated trigram contains repeated bigrams/words), so any doc with
    // dup_trigram > 0 must have dup_word > 0
    assert(rep.filter(col("dup_trigram_ratio") > 0 && col("dup_word_ratio") === 0)
      .count() == 0)
    rep.unpersist()
  }

  test("contamination excludes the benchmark docs and reports sane fractions") {
    val c = CorpusOps.contamination(spark, sf).cache()
    assert(c.filter(col("doc_id") % 20 === 0).count() == 0)
    assert(c.filter(col("n_hit") > col("n_grams")).count() == 0)
    assert(c.filter(col("hit_ratio") <= 0 || col("hit_ratio") > 1).count() == 0)
    // an exact copy of a benchmark doc is fully contaminated: plant one by
    // checking any doc whose text equals a benchmark doc's text scores 1.0
    val docs = Tables.documents(spark, sf)
    val benchTexts = docs.filter(col("doc_id") % 20 === 0).select(col("text").as("bt"))
    val copies = docs.filter(col("doc_id") % 20 =!= 0)
      .join(benchTexts, col("text") === col("bt"), "left_semi")
      .select("doc_id")
    val flagged = c.filter(col("hit_ratio") === 1.0).select("doc_id")
    assert(copies.join(flagged, Seq("doc_id"), "left_anti").count() == 0)
    c.unpersist()
  }

  test("mix sampler hits each source's target rate and is deterministic") {
    val kept = CorpusOps.mixSample(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
      .withColumn("k", substring(col("source"), 4, 10).cast("long") % 4 + 1)
    // per rate-bucket, the kept fraction should be near k/5 (binomial CI;
    // generous ±0.15 absolute at the ~100-doc-per-bucket test scale)
    val tot = docs.groupBy("k").count().withColumnRenamed("count", "n")
    val got = kept.groupBy("rate_fifths").count()
      .withColumnRenamed("count", "n_kept").withColumnRenamed("rate_fifths", "k")
    val joined = tot.join(got, Seq("k"))
      .withColumn("frac", col("n_kept").cast("double") / col("n"))
      .withColumn("target", col("k").cast("double") / 5)
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (frac, target) = (r.getAs[Double]("frac"), r.getAs[Double]("target"))
      assert(math.abs(frac - target) < 0.15, s"k=${r.getAs[Long]("k")} frac=$frac")
    }
    // deterministic: a second run is identical
    val again = CorpusOps.mixSample(spark, sf)
    assert(kept.exceptAll(again).count() == 0 && again.exceptAll(kept).count() == 0)
    kept.unpersist()
  }

  test("span prune: survivors count exactly the distinct spans; no doc gains spans") {
    import org.apache.spark.sql.functions._
    val pruned = CorpusOps.spanPruneFirstWins(spark, sf).cache()
    // first-wins keeps exactly one instance per distinct span text
    val distinctSpans = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("n", size(col("ws")))
      .select(expr("explode(sequence(0L, (n - 1) div 16))").as("c"), col("ws"))
      .select(concat_ws(" ", expr("slice(ws, CAST(c * 16 + 1 AS INT), 16)")).as("span"))
      .distinct().count()
    val kept = pruned.agg(sum("n_kept")).head().getLong(0)
    assert(kept == distinctSpans, s"kept=$kept distinct=$distinctSpans")
    assert(pruned.filter(col("n_kept") > col("n_spans")).count() == 0)
    // and something was actually removed (the corpus has cross-doc overlap)
    assert(pruned.filter(col("n_kept") < col("n_spans")).count() > 0)
    pruned.unpersist()
  }

  test("dataset split: stable under re-run, and a planted cross-split dup flips the leak audit") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val r1 = CorpusOps.datasetSplit(spark, sf).collect()
    val r2 = CorpusOps.datasetSplit(spark, sf).collect()
    assert(r1.sameElements(r2), "split assignment must be deterministic")
    assert(r1.map(_.getLong(1)).sum == Tables.documents(spark, sf).count())
    // plant one duplicate CONTENT across two ids that hash to different
    // splits (found by probing the same md5 rule the operator uses)
    def splitOf(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split:$id".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(2)
      if (hex < "cc") "train" else if (hex < "e6") "val" else "test"
    }
    val trainId = (1L to 1000L).find(splitOf(_) == "train").get
    val testId = (1L to 1000L).find(splitOf(_) == "test").get
    val planted = Seq(
      (trainId, "identical planted document content", 34L),
      (testId, "identical planted document content", 34L),
      (trainId + 10000L, "some other unique content", 25L))
      .toDF("doc_id", "text", "n_chars")
    val audit = CorpusOps.datasetSplitOf(planted).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(audit("train") >= 1L && audit("test") >= 1L,
      s"planted train/test dup must be flagged in both splits: $audit")
  }

  test("adaptive quality filter keeps at least half of every source (median cut)") {
    import org.apache.spark.sql.functions._
    val r = CorpusOps.qualityAdaptiveFilter(spark, sf).collect()
    assert(r.length == 20)
    r.foreach { row =>
      assert(row.getLong(2) * 2 >= row.getLong(1),
        s"${row.getString(0)}: score >= median must keep >= half")
      assert(row.getLong(2) <= row.getLong(1))
    }
  }

  test("weighted median: token-mass median dominates the doc-count median") {
    import org.apache.spark.sql.functions._
    val r = CorpusOps.weightedMedian(spark, sf).collect()
    assert(r.length == 20)
    // sequential recomputation of both medians from the raw lengths
    val lens = Tables.documents(spark, sf)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("v"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    r.foreach { row =>
      val vs = lens(row.getString(0))
      val docMed = vs((vs.size - 1) / 2) // percentile_disc(0.5): lower median
      val total = vs.sum
      val massMed = vs.distinct.find(t => vs.filter(_ <= t).sum * 2 >= total).get
      assert(row.getAs[Long]("median_len_by_docs") === docMed, row.getString(0))
      assert(row.getAs[Long]("median_len_by_tokens") === massMed, row.getString(0))
      assert(row.getAs[Long]("total_tokens") === total)
      assert(massMed >= docMed, "token mass concentrates in longer docs")
    }
  }

  test("quality calibration: pct is a within-source rank scale, quartile ~25%") {
    import org.apache.spark.sql.functions._
    val cal = CorpusOps.qualityCalibration(spark, sf).cache()
    // pct in [0,1]; exactly one 0 per singleton-free source ordering: the
    // min-score doc(s) of each source sit at pct 0, max at 1 (n>1 sources)
    assert(cal.filter(col("pct") < 0 || col("pct") > 1).count() == 0)
    val perSource = cal.groupBy("source")
      .agg(count(lit(1)).as("n"), min("pct").as("lo"), max("pct").as("hi"),
        sum(col("top_quartile").cast("long")).as("q"))
      .collect()
    perSource.foreach { r =>
      assert(r.getDouble(2) === 0.0, s"${r.getString(0)} min pct")
      assert(r.getDouble(3) === 1.0, s"${r.getString(0)} max pct")
      // the top-quartile flag selects roughly a quarter (ties can widen it)
      val (n, q) = (r.getLong(1), r.getLong(4))
      assert(q >= n / 5 && q <= n / 2, s"${r.getString(0)}: $q of $n flagged")
    }
    // rank semantics: within a source, higher score never has lower pct
    val viol = cal.as("a").join(cal.as("b"),
        col("a.source") === col("b.source") &&
        col("a.score_ppm") > col("b.score_ppm") &&
        col("a.pct") < col("b.pct"))
      .count()
    assert(viol == 0, s"$viol monotonicity violations")
    cal.unpersist()
  }
}
