package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup

/** Plants an index corpus + ingestion batch (top decile of doc_id) and
  * checks the incremental near-dup probe: a batch doc that is a shingle-
  * level near-copy of an index doc is caught with its exact Jaccard; a
  * unique batch doc is silent; duplicates WITHIN the batch are not this
  * query's output (they belong to the batch-local minhashLsh pass). */
class IncrementalMinhashSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_incmh").toString
    val rng = new scala.util.Random(7)
    def doc(seed: Int, n: Int): String =
      Seq.fill(n)(s"w${rng.nextInt(50)}x$seed").mkString(" ")
    import spark.implicits._
    // ids 0..89 = index, 90..99 = batch (thr = 9 * 99 / 10 = 89... ids
    // ≥ 89 are batch; keep the planted pairs clear of the boundary)
    val base = doc(1, 60)
    val batchDup = doc(900, 40)
    val docs =
      (0L until 89L).map(i => (i, if (i == 10) base else doc(i.toInt + 100, 40))) ++ Seq(
        // batch doc 95: near-copy of index doc 10 (append 2 words of 62)
        95L -> (base + " zz1 zz2"),
        // batch docs 96/97: identical to EACH OTHER, unlike any index doc
        96L -> batchDup,
        97L -> batchDup,
        // batch rest: unique
        90L -> doc(901, 40), 91L -> doc(902, 40), 92L -> doc(903, 40),
        93L -> doc(904, 40), 94L -> doc(905, 40), 98L -> doc(906, 40),
        99L -> doc(907, 40))
    docs.toDF("doc_id", "text")
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
      .repartition(4).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("batch near-copy of an index doc is caught with exact Jaccard") {
    val rows = Dedup.minhashIncremental(spark, dir, threshold = 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(t => (t._1, t._2)).toSeq === Seq((10L, 95L)),
      s"got ${rows.toSeq}")
    // 60-word doc: 58 distinct 3-gram shingles; +2 appended words add 2
    // trailing shingles → inter = 58, union = 60
    assert(math.abs(rows.head._3 - 58.0 / 60.0) < 1e-6)
  }

  test("probe cost shape: no batch-batch pair ever reported") {
    val rows = Dedup.minhashIncremental(spark, dir, threshold = 0.8).collect()
    val thr = 89L
    assert(rows.forall(r => r.getLong(0) < thr && r.getLong(1) >= thr))
    // 96/97 are identical but both in the batch — absent by contract
    assert(!rows.exists(r => r.getLong(1) == 96L || r.getLong(1) == 97L))
  }
}
