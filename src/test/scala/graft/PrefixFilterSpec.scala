package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup

/** The r17 threshold-adaptive ngram-Jaccard: prefix-filtered candidates
  * + array verify at t ≥ 0.7, the count-aggregate gram join (optionally
  * as sequential disjoint gram shards) below — BOTH must be LOSSLESS,
  * byte-identical to the brute-force inverted-index join. Pins:
  *
  *  1. end-to-end equality against a spec-local brute-force join over
  *     the same stored shingle table, at thresholds spanning both
  *     physical shapes AND the prefix-length edge cases (t·m landing
  *     on and off integers): 0.3/0.5 exercise the count shape,
  *     0.8/0.9 the prefix shape;
  *  2. the sharded count path (forced shards = 3) equals the
  *     single-pass count path — disjoint gram shards' partial counts
  *     must sum to the exact intersection per pair;
  *  3. the prefix lemma itself, property-tested over random set pairs
  *     with the exact prefix-length formula the query uses (including
  *     its ε guard): J(A,B) ≥ t ⇒ the rarest-first prefixes intersect;
  *  4. the v3 artifact order — arrays sorted by (global df, hash) —
  *     because the zero-cost `slice` prefix is only correct if the
  *     STORED order is the global order the lemma assumes.
  */
class PrefixFilterSpec extends AnyFunSuite {
  import TestSpark._

  private def bruteForce(threshold: Double) = {
    val docs = Dedup.shingleTable(spark, sf)
    val ex = docs.select(col("doc_id"), col("m"), explode(col("sh")).as("sh1"))
    val a = ex.select(col("doc_id").as("doc_a"), col("m").as("ma"), col("sh1"))
    val b = ex.select(col("doc_id").as("doc_b"), col("m").as("mb"), col("sh1"))
    a.join(b, a("sh1") === b("sh1") && col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b", "ma", "mb")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("ma") + col("mb") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  test("prefix-filtered ngramJaccard equals brute force at every threshold") {
    // 0.5 is the gate's contract; 0.9 feeds minhash oracles; 0.3/0.8
    // land t·m on/off integer boundaries for the fixture's m values
    Seq(0.3, 0.5, 0.8, 0.9).foreach { t =>
      val fast = Dedup.ngramJaccard(spark, sf, t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val brute = bruteForce(t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(fast == brute,
        s"t=$t prefix-only=${fast -- brute} brute-only=${brute -- fast}")
      assert(brute.nonEmpty || t > 0.5, s"t=$t produced no pairs — vacuous")
    }
  }

  test("sharded count path equals the single-pass count path (forced K=3)") {
    val docs = Dedup.shingleTable(spark, sf)
    Seq(0.3, 0.5).foreach { t =>
      val sharded = Dedup.countJaccard(spark, docs, sf, t, shards = 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val single = Dedup.countJaccard(spark, docs, sf, t, shards = 1).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(sharded == single,
        s"t=$t sharded-only=${sharded -- single} single-only=${single -- sharded}")
      assert(single.nonEmpty || t > 0.4, s"t=$t vacuous")
    }
  }

  test("prefix lemma holds for the exact formula the query uses (property)") {
    val rng = new scala.util.Random(0x9f17)
    def pfxLen(m: Int, t: Double): Int =
      math.max(1, m - math.ceil(m * t - 1e-9).toInt + 1)
    (1 to 3000).foreach { _ =>
      // random universe with a random global order; random overlapping sets
      val universe = rng.shuffle((0 until 60).toVector)
      val rank = universe.zipWithIndex.toMap
      val core = rng.shuffle((0 until 60).toVector).take(3 + rng.nextInt(20)).toSet
      val a = core ++ Set.fill(rng.nextInt(8))(rng.nextInt(60))
      val b = core ++ Set.fill(rng.nextInt(8))(rng.nextInt(60))
      val j = (a & b).size.toDouble / (a | b).size
      val t = Seq(0.3, 0.5, 0.8, 0.9)(rng.nextInt(4))
      if (j >= t) {
        val pa = a.toSeq.sortBy(rank).take(pfxLen(a.size, t)).toSet
        val pb = b.toSeq.sortBy(rank).take(pfxLen(b.size, t)).toSet
        assert((pa & pb).nonEmpty,
          s"lemma violated: t=$t j=$j |a|=${a.size} |b|=${b.size} — prefix too short")
      }
    }
  }

  test("shingle arrays are stored rarest-first (global df, then hash)") {
    val docs = Dedup.shingleTable(spark, sf)
    val df = docs.select(explode(col("sh")).as("h"))
      .groupBy("h").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.select("doc_id", "sh").collect().foreach { r =>
      val sh = r.getSeq[Long](1)
      val keys = sh.map(h => (df(h), h))
      assert(keys == keys.sorted,
        s"doc ${r.getLong(0)}: stored array is not in (df, hash) order")
    }
  }

  test("the prefix filter actually prunes: fewer candidates than the full join") {
    val docs = Dedup.shingleTable(spark, sf)
    val full = docs.select(col("doc_id"), explode(col("sh")).as("g"))
    def cands(src: org.apache.spark.sql.DataFrame): Long = {
      val a = src.select(col("doc_id").as("doc_a"), col("g"))
      val b = src.select(col("doc_id").as("doc_b"), col("g"))
      a.join(b, Seq("g")).filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct().count()
    }
    val t = 0.5
    val pfxLenC = greatest(lit(1),
      (col("m") - ceil(col("m") * lit(t) - lit(1e-9)) + lit(1)).cast("int"))
    val pfx = docs.select(col("doc_id"), explode(slice(col("sh"), lit(1), pfxLenC)).as("g"))
    val (nFull, nPfx) = (cands(full), cands(pfx))
    info(s"candidates: full=$nFull prefix=$nPfx")
    assert(nPfx < nFull, "prefix filter pruned nothing on the fixture corpus")
  }
}
