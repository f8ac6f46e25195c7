package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.CorpusOps

/** Priority sampling (Duffield–Lund–Thorup): the distributed sample must
  * equal a sequential brute-force replica of the same priority formula
  * (w·2^32/(u32+1), one IEEE division — bit-identical on the JVM), the
  * threshold estimator must be EXACT when the sample covers the corpus
  * (τ = 0 ⇒ Σ max(w, τ) = Σ w), and the top-m must come from
  * TakeOrderedAndProject, not a global sort. */
class PrioritySampleSpec extends AnyFunSuite {
  import TestSpark._

  // the same salted-md5 uniform the operator derives, computed sequentially
  private def u32plus1(id: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"wsample:$id".getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16) + 1L
  }

  private def corpus(n: Int): Seq[(Long, String, String)] =
    (0 until n).map { i =>
      // token counts spread 3..3+4n/… so weights genuinely vary
      val words = 3 + (i * 7) % 40
      (i.toLong, s"src${i % 3}", (0 until words).map(w => s"w${i}x$w").mkString(" "))
    }

  test("sample equals sequential brute-force top-m by priority") {
    import spark.implicits._
    val docs = corpus(200)
    val expected = docs.map { case (id, _, text) =>
      val w = text.split(" ").length.toLong
      (id, w.toDouble * 4294967296.0 / u32plus1(id).toDouble)
    }.sortBy { case (id, p) => (-p, id) }.take(25).map(_._1).sorted
    val got = CorpusOps.weightedSampleFrom(
      docs.toDF("doc_id", "source", "text").repartition(5), m = 25)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq === expected.toSeq)
  }

  test("estimator is exact when m covers the corpus (tau = 0)") {
    import spark.implicits._
    val docs = corpus(30)
    val exact = docs.map(_._3.split(" ").length.toLong).sum
    val r = CorpusOps.prioritySubsetSumFrom(
      docs.toDF("doc_id", "source", "text"), m = 50).collect().head
    assert(r.getAs[Long]("tau_q4") === 0L)
    assert(r.getAs[Long]("est_total_q4") === exact * 10000L)
    assert(r.getAs[Boolean]("in_bound"))
  }

  test("fixture estimate is in bound and favors token mass over doc count") {
    val r = CorpusOps.prioritySubsetSum(spark, sf, m = 50).collect().head
    assert(r.getAs[Boolean]("in_bound"))
    // weighted sampling's point: the 50 sampled docs carry more token mass
    // than 50 uniformly-expected docs would (heavier docs are favored)
    val sampled = CorpusOps.weightedSample(spark, sf, m = 50)
      .agg(sum("n_tokens")).head().getLong(0)
    val total = r.getAs[Long]("exact_total_tokens")
    val nDocs = r.getAs[Long]("n_docs")
    assert(sampled.toDouble / total > 50.0 / nDocs,
      s"sampled mass $sampled/$total not above uniform share 50/$nDocs")
  }

  test("plan takes top-m without a global sort") {
    val plan = CorpusOps.weightedSample(spark, sf, m = 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }
}
