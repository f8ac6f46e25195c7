package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TokenOps

class TokenOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("token rarity: invariants hold against raw token counts") {
    val r = TokenOps.tokenRarity(spark, sf).cache()
    // one row per document; token totals reconcile with a direct count
    val docs = Tables.documents(spark, sf)
    assert(r.count() == docs.count())
    val direct = docs.select(sum(size(split(col("text"), " ")))).head().getLong(0)
    assert(r.agg(sum("n_tokens")).head().getLong(0) == direct)
    // every token occurs at least once, so sum_freq >= n_tokens,
    // and hapax can never exceed the doc's token count
    assert(r.filter(col("sum_freq") < col("n_tokens")).count() == 0)
    assert(r.filter(col("n_hapax") > col("n_tokens")).count() == 0)
    assert(r.filter(col("rarity_ppm") > 1000000L).count() == 0)
    r.unpersist()
  }

  test("bpe pair counts: pairs are 2-char lowercase, counts reconcile") {
    val r = TokenOps.bpePairCounts(spark, sf).cache()
    assert(r.count() == 50)
    assert(r.filter(length(col("pair")) =!= 2 || col("pair").rlike("[^a-z]")).count() == 0)
    // total adjacent pairs = sum over words of (len - 1); top-50 can't exceed it
    val total = Tables.documents(spark, sf)
      .select(explode(split(regexp_replace(lower(col("text")), "[^a-z ]", ""), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(sum(length(col("w")) - 1)).head().getLong(0)
    assert(r.agg(sum("n")).head().getLong(0) <= total)
    r.unpersist()
  }

  test("doc chunking: windows tile every document with stride 32") {
    val r = TokenOps.docChunking(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
    // chunk count per doc follows the integer rule (n-1) div 32 + 1
    val counts = r.groupBy("doc_id").agg(count(lit(1)).as("chunks"))
    assert(counts.join(docs, "doc_id")
      .filter(col("chunks") =!= expr("(n - 1) div 32 + 1")).count() == 0)
    // every chunk except possibly trailing ones is exactly 64 tokens wide;
    // all chunks are 1..64 tokens
    assert(r.filter(col("n_toks") < 1 || col("n_toks") > 64).count() == 0)
    // a chunk is short only when it reaches the doc's end
    assert(r.join(docs, "doc_id")
      .filter(col("n_toks") < 64 && col("chunk_id") * 32 + col("n_toks") =!= col("n"))
      .count() == 0)
    r.unpersist()
  }

  test("incremental dedup: survivors are new, unique, and complete") {
    val r = TokenOps.dedupIncremental(spark, sf).cache()
    // all survivors come from the batch
    assert(r.filter(col("doc_id") % 10 =!= 0).count() == 0)
    // content_hash is unique among survivors
    assert(r.count() == r.select("content_hash").distinct().count())
    // no survivor's hash exists in the corpus side
    val corpusHashes = Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 =!= 0)
      .select(md5(trim(regexp_replace(
        regexp_replace(lower(col("text")), "[.!?,;:]", ""), " +", " "))).as("content_hash"))
    assert(r.join(corpusHashes, "content_hash").count() == 0)
    // completeness: every batch hash either survives or exists in the corpus
    val batchHashes = Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 === 0)
      .select(md5(trim(regexp_replace(
        regexp_replace(lower(col("text")), "[.!?,;:]", ""), " +", " "))).as("content_hash"))
      .distinct()
    val accounted = r.select("content_hash")
      .unionByName(corpusHashes.distinct()).distinct()
    assert(batchHashes.join(accounted, Seq("content_hash"), "left_anti").count() == 0)
    r.unpersist()
  }
}
