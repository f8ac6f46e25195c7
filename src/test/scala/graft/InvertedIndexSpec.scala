package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.InvertedIndex

/** Positional inverted index (ops/InvertedIndex.scala): the oracle gate
  * proves the gated phrase/proximity answers against DuckDB; this spec
  * proves the MACHINERY on ground truth computed directly from the raw
  * text — any phrase length, occurrence counting inside one doc, and
  * the empty-result edge. */
class InvertedIndexSpec extends AnyFunSuite {
  import TestSpark._

  /** Brute-force phrase occurrences per doc from the raw text. */
  private def bruteForce(phrase: String): Map[Long, Long] = {
    val terms = phrase.split(" ")
    Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getString(1).split(" ")
        val hits = toks.indices.count(i =>
          i + terms.length <= toks.length &&
            terms.indices.forall(j => toks(i + j) == terms(j)))
        r.getLong(0) -> hits.toLong
      }
      .filter(_._2 > 0).toMap
  }

  test("phrase hits equal the brute-force text scan (2, 3 and 4 words)") {
    // derive phrases actually present: take the first doc's first tokens
    val first = Tables.documents(spark, sf).orderBy("doc_id")
      .select("text").head().getString(0).split(" ")
    for (len <- Seq(2, 3, 4)) {
      val phrase = first.take(len).mkString(" ")
      val got = InvertedIndex.phraseHits(spark, sf, phrase).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == bruteForce(phrase), s"phrase '$phrase'")
    }
  }

  test("an absent phrase returns zero rows") {
    assert(InvertedIndex.phraseHits(spark, sf, "no such phrase qqq")
      .collect().isEmpty)
  }

  test("proximity pairs match the window definition") {
    val idx = Tables.documents(spark, sf).select("doc_id", "text").collect()
    val w = 5
    val want = idx.flatMap { r =>
      val toks = r.getString(1).split(" ")
      val as = toks.indices.filter(toks(_) == "spark")
      val bs = toks.indices.filter(toks(_) == "join")
      val pairs = for (a <- as; b <- bs if b > a && b <= a + w) yield (a, b)
      if (pairs.isEmpty) None
      else Some(r.getLong(0) -> (pairs.size.toLong, pairs.map(_._1).min + 1L))
    }.toMap
    assert(want.nonEmpty, "fixture must contain in-window pairs or the gate is vacuous")
    val got = InvertedIndex.proximitySearch(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want)
  }

  test("incremental stored∪batch phrase search equals the full-corpus answer, both sides non-empty") {
    val got = InvertedIndex.phraseIncremental(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val want = bruteForce("big data")
    assert(got.map(t => t._1 -> t._2).toMap == want,
      "stored index + fresh batch postings must answer exactly like a full rebuild")
    val srcs = got.map(_._3).toSet
    assert(srcs == Set("index", "batch"),
      s"fixture must exercise BOTH provenance sides, got $srcs")
  }
}
