package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.CorpusOps
import graft.queries.StatOps

/** Sequential-reference checks for the two operators whose oracles use
  * the contract-boolean pattern (NOTES.md moral: gate-green proves engine
  * AGREEMENT, so the analytic math needs an independent reference):
  * the PCA eigensolver against a KNOWN planted spectrum, and the epoch
  * shuffle's determinism / decorrelation / balance properties.
  */
class PcaEpochShuffleSpec extends AnyFunSuite {
  import TestSpark._

  // ------------------------------------------------------------------- PCA

  test("jacobiEigen recovers a planted spectrum and eigenbasis") {
    // C = R · diag(9, 4, 1) · Rᵀ for a known rotation R (Givens in the
    // (0,1) plane by 30° composed with (1,2) by 60°)
    val d = 3
    def givens(i: Int, j: Int, th: Double): Array[Array[Double]] = {
      val m = Array.tabulate(d, d)((a, b) => if (a == b) 1.0 else 0.0)
      m(i)(i) = math.cos(th); m(j)(j) = math.cos(th)
      m(i)(j) = -math.sin(th); m(j)(i) = math.sin(th)
      m
    }
    def mul(x: Array[Array[Double]], y: Array[Array[Double]]) =
      Array.tabulate(d, d)((i, j) => (0 until d).map(k => x(i)(k) * y(k)(j)).sum)
    val r = mul(givens(0, 1, math.Pi / 6), givens(1, 2, math.Pi / 3))
    val lam = Array(9.0, 4.0, 1.0)
    val c = Array.tabulate(d, d)((i, j) =>
      (0 until d).map(k => r(i)(k) * lam(k) * r(j)(k)).sum)
    val (vals, vecs) = StatOps.jacobiEigen(c)
    val sorted = vals.sorted(Ordering[Double].reverse)
    lam.zip(sorted).foreach { case (want, got) =>
      assert(math.abs(want - got) < 1e-9, s"eigenvalue $want vs $got")
    }
    // eigenvectors match the planted basis up to sign
    val order = vals.zipWithIndex.sortBy(-_._1).map(_._2)
    for (k <- 0 until d) {
      val v = Array.tabulate(d)(i => vecs(i)(order(k)))
      val dot = math.abs((0 until d).map(i => v(i) * r(i)(k)).sum)
      assert(math.abs(dot - 1.0) < 1e-9, s"component $k misaligned: |dot|=$dot")
    }
  }

  test("embedding_pca's analytic contracts all hold on the real corpus") {
    val rows = StatOps.embeddingPca(spark, sf).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("var_matches_eigval"), "Var(score) != lambda")
      assert(r.getAs[Boolean]("orthonormal"))
      assert(r.getAs[Boolean]("eigen_ok"))
      assert(r.getAs[Boolean]("descending"))
    }
  }

  // --------------------------------------------------------- epoch shuffle

  test("epoch shuffle is deterministic and epoch-decorrelated") {
    val e1 = CorpusOps.epochShuffle(spark, sf, "42").collect()
    val e1again = CorpusOps.epochShuffle(spark, sf, "42").collect()
    assert(e1.toSeq == e1again.toSeq, "same seed must reproduce the epoch")
    // a different seed re-permutes: per-doc shard assignments must move
    // for roughly 15/16 of documents (same shard only by 1/16 collision)
    val docs = graft.Tables.documents(spark, sf)
    val moved = docs
      .withColumn("s1", substring(CorpusOps.epochShuffleKey("42"), 1, 1))
      .withColumn("s2", substring(CorpusOps.epochShuffleKey("43"), 1, 1))
      .agg(sum(when(col("s1") =!= col("s2"), 1L).otherwise(0L)).as("moved"),
        count(lit(1)).as("n")).head()
    val frac = moved.getLong(0).toDouble / moved.getLong(1)
    assert(frac > 0.8, s"only $frac of docs changed shard across epochs")
  }

  test("epoch shuffle shards are balanced and partition the corpus") {
    val shards = CorpusOps.epochShuffle(spark, sf).collect()
    val sizes = shards.map(_.getAs[Long]("n_docs"))
    val total = graft.Tables.documents(spark, sf).count()
    assert(sizes.sum == total, "shards must partition the corpus exactly")
    assert(shards.length == 16, s"expected 16 hex shards, got ${shards.length}")
    // md5 is uniform: no shard more than 4x another at n=500/16 shards
    assert(sizes.max <= 4 * math.max(1L, sizes.min),
      s"shard skew: min=${sizes.min} max=${sizes.max}")
  }
}
