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
}
