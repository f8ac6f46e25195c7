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
    val fp = Dedup.simhash(spark, sf).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val dups = Dedup.ngramJaccard(spark, sf, 0.9).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(dups.nonEmpty)
    val dupHam = dups.map { case (a, b) => ham(fp(a), fp(b)) }
    // near-identical word multisets → nearly identical simhash
    assert(dupHam.forall(_ <= 6), s"dup hamming distances: ${dupHam.toSeq}")
    val ids = fp.keys.toArray.sorted
    val randHam = ids.take(50).sliding(2, 2).collect { case Array(a, b) if !dups.contains((a, b)) =>
      ham(fp(a), fp(b))
    }.toSeq
    assert(randHam.count(_ > 6) > randHam.length / 2, s"random hamming: $randHam")
  }

  test("LSH ANN achieves usable recall vs brute force") {
    val brute = Similarity.annTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.annLshTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    info(f"recall@${Similarity.K} = $recall%.2f")
    assert(recall >= 0.3, f"recall $recall%.2f too low — LSH is not finding neighbors")
  }

  test("text quality score is bounded and fingerprint is order-sensitive") {
    val q = TextOps.quality(spark, sf)
    assert(q.where(col("quality_score") < 0 || col("quality_score") > 1).count() == 0)
    val fps = TextOps.fingerprint(spark, sf).limit(100).collect().map(_.getLong(1))
    assert(fps.distinct.length > 90, "fingerprints should be near-unique")
  }
}
