package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SubstringDedup

/** Plants documents with KNOWN verbatim overlaps and cross-checks the
  * anchor-gram diagonal-run detector against a brute-force word-level
  * longest-common-substring DP over every pair — the detector claims
  * EXACT lcs lengths (not lower bounds), so the spec demands equality,
  * including the ≥L boundary (12 words reported, 11 words invisible). */
class SubstringDedupSpec extends AnyFunSuite {
  import TestSpark._

  private val L = 12

  // Unique filler so no accidental cross-doc L-gram exists: every filler
  // token carries its doc id and position.
  private def filler(doc: Int, n: Int, from: Int = 0): Seq[String] =
    (from until from + n).map(i => s"f${doc}x$i")

  private val run20 = (0 until 20).map(i => s"sharedA$i")
  private val run12 = (0 until 12).map(i => s"sharedB$i")
  private val run11 = (0 until 11).map(i => s"sharedC$i")
  private val run13 = (0 until 13).map(i => s"sharedD$i")

  private val corpus: Seq[(Long, String)] = Seq(
    // d1/d2 share 20 words; d1/d3 share exactly L=12 (boundary: visible)
    1L -> (filler(1, 5) ++ run20 ++ filler(1, 4, 100) ++ run12).mkString(" "),
    2L -> (filler(2, 3) ++ run20 ++ filler(2, 7, 100)).mkString(" "),
    3L -> (run12 ++ filler(3, 9)).mkString(" "),
    // d4/d5 share only 11 words — below L, must NOT appear
    4L -> (filler(4, 6) ++ run11 ++ filler(4, 3, 100)).mkString(" "),
    5L -> (run11 ++ filler(5, 8)).mkString(" "),
    // d6/d7 share TWO disjoint runs (20 and 13) — lcs is the max,
    // n_anchor_matches sums both diagonals' islands
    6L -> (run20 ++ filler(6, 4) ++ run13).mkString(" "),
    7L -> (filler(7, 2) ++ run13 ++ filler(7, 5, 100) ++ run20).mkString(" "),
    // d8 shorter than L words — excluded from gramming entirely
    8L -> filler(8, 7).mkString(" "),
    // d9 contains run20 twice (internal repetition): pairs with d1/d2/d7
    // must still report lcs 20, counting each alignment diagonal cleanly
    9L -> (run20 ++ filler(9, 3) ++ run20).mkString(" ")
  )

  /** Brute-force word-level longest common substring (DP, O(n·m)). */
  private def lcsWords(a: Array[String], b: Array[String]): Int = {
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    var best = 0
    for (i <- 1 to a.length; j <- 1 to b.length)
      if (a(i - 1) == b(j - 1)) {
        dp(i)(j) = dp(i - 1)(j - 1) + 1
        if (dp(i)(j) > best) best = dp(i)(j)
      }
    best
  }

  test("exact lcs on every planted pair, >=L boundary included") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text").repartition(4)
    val got = SubstringDedup.substringPairsFrom(docs, L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    val words = corpus.toMap.map { case (id, t) => id -> t.split(" ") }
    val expected = (for {
      a <- corpus.map(_._1); b <- corpus.map(_._1) if a < b
      l = lcsWords(words(a), words(b)) if l >= L
    } yield (a, b) -> l.toLong).toMap

    assert(got.keySet === expected.keySet,
      s"pair set mismatch: extra=${got.keySet -- expected.keySet} missing=${expected.keySet -- got.keySet}")
    for ((pair, l) <- expected)
      assert(got(pair) === l, s"pair $pair: got ${got(pair)}, brute force $l")
    // sanity on the planted design itself
    assert(expected((1L, 2L)) === 20L)
    assert(expected((1L, 3L)) === 12L)   // boundary: exactly L
    assert(!expected.contains((4L, 5L))) // 11 < L invisible
    assert(expected((6L, 7L)) === 20L)
  }

  test("anchor-match count sums all islands across diagonals") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text").repartition(4)
    val byPair = SubstringDedup.substringPairsFrom(docs, L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    // single shared run of m words = m − L + 1 anchors
    assert(byPair((1L, 2L)) === (20 - L + 1).toLong)
    assert(byPair((1L, 3L)) === 1L)
    // two disjoint runs on different diagonals: (20−L+1) + (13−L+1)
    assert(byPair((6L, 7L)) === ((20 - L + 1) + (13 - L + 1)).toLong)
    // d9 holds run20 TWICE: vs d2 (one copy) → two diagonals, 9 anchors each
    assert(byPair((2L, 9L)) === 2L * (20 - L + 1))
  }

  test("random corpora with random planted overlaps match brute-force LCS (12 trials)") {
    import spark.implicits._
    val rng = new scala.util.Random(0xd0c5)
    // small word alphabet so overlaps ≥ L also arise BY CHANCE, not only
    // by planting — the detector must agree with the DP on those too
    (1 to 12).foreach { trial =>
      val nDocs = 4 + rng.nextInt(8)
      val shared = (0 until 3).map(k =>
        (0 until (L + rng.nextInt(12))).map(i => s"s${k}r$i"))
      val docs = (0L until nDocs.toLong).map { id =>
        val parts = (0 until (1 + rng.nextInt(4))).flatMap { _ =>
          if (rng.nextBoolean()) shared(rng.nextInt(3))
          else (0 until (3 + rng.nextInt(15))).map(_ => s"v${rng.nextInt(6)}")
        }
        id -> parts.mkString(" ")
      }
      val got = SubstringDedup
        .substringPairsFrom(docs.toDF("doc_id", "text").repartition(3), L)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val words = docs.toMap.map { case (id, t) => id -> t.split(" ") }
      val expected = (for {
        a <- docs.map(_._1); b <- docs.map(_._1) if a < b
        l = lcsWords(words(a), words(b)) if l >= L
      } yield (a, b) -> l.toLong).toMap
      assert(got === expected, s"trial $trial (nDocs=$nDocs) diverged")
    }
  }

  test("grams past the document-frequency cap never anchor a pair") {
    import spark.implicits._
    val hot = (0 until 12).map(i => s"viral$i")   // appears in ALL four docs
    val uniq = (0 until 14).map(i => s"uniq$i")   // only in 21 and 22
    val docs = Seq(
      21L -> (hot ++ filler(21, 3) ++ uniq).mkString(" "),
      22L -> (filler(22, 2) ++ uniq ++ filler(22, 3, 100) ++ hot).mkString(" "),
      23L -> (hot ++ filler(23, 5)).mkString(" "),
      24L -> (filler(24, 4) ++ hot).mkString(" ")
    ).toDF("doc_id", "text").repartition(2)
    val got = SubstringDedup.substringPairsFrom(docs, L, maxDf = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // the viral gram (df = 4 > 2) is defused: only the sub-cap overlap
    // between 21 and 22 survives, with its exact length
    assert(got === Map((21L, 22L) -> 14L))
    // and with the cap at the default the same corpus reports all pairs
    val uncapped = SubstringDedup.substringPairsFrom(docs, L).collect()
    assert(uncapped.length === 6) // C(4,2) pairs all share the viral run
  }
}
