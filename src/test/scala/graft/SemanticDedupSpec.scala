package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Similarity}

/** The end-to-end semantic-dedup funnel on PLANTED cluster structure
  * (uniform synthetic embeddings barely merge — the oracle checks the
  * composition, this spec checks the semantics where neighbors exist). */
class SemanticDedupSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_semdedup").toString
    val rng = new scala.util.Random(11)
    val centers = Array.fill(25, Similarity.Dim)(rng.nextGaussian())
    import spark.implicits._
    (0L until 500L).map { id =>
      val c = centers((id / 20).toInt)
      (id, c.map(x => (x + 0.05 * rng.nextGaussian()).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
      .repartition(4).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    // quality rises STRICTLY with doc_id % 20 via the alpha-ratio term
    // (k alphabetic words vs 20-k numeric ones; the stopword term stays 0
    // and the length term constant), so each planted 20-doc cluster's
    // best member is its highest in-cluster id
    (0L until 500L).map { id =>
      val k = (id % 20).toInt
      (id, (Seq.fill(k)("abc") ++ Seq.fill(20 - k)("123")).mkString(" "))
    }.toDF("doc_id", "text")
      .repartition(4).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("semantic dedup merges planted clusters and keeps the best-quality member") {
    val out = Dedup.semanticDedup(spark, dir, threshold = 0.9).cache()
    val rows = out.collect()
    // 500 vectors in 25 tight clusters: the funnel must merge aggressively
    assert(rows.length < 100, s"${rows.length} clusters — barely merged")
    // every kept doc has the maximum quality within its cluster; with
    // quality increasing in id%20, a fully-merged planted cluster keeps
    // id%20 == 19 — check the dominant pattern holds for all big clusters
    val big = rows.filter(_.getAs[Long]("n_members") >= 10)
    assert(big.nonEmpty)
    big.foreach { r =>
      assert(r.getAs[Long]("keep_id") % 20 == 19,
        s"cluster ${r.getAs[Long]("cluster_root")} kept ${r.getAs[Long]("keep_id")}")
    }
    // survivors partition the corpus: cluster sizes sum to 500
    assert(rows.map(_.getAs[Long]("n_members")).sum == 500L)
    out.unpersist()
  }
}
