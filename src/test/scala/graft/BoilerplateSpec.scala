package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Boilerplate

/** Plants template segments and checks the strip semantics exactly:
  * a 16-token segment repeated in ≥ K docs of ONE source is cut there
  * but survives verbatim in another source below the threshold (the
  * per-source scoping that makes this boilerplate removal, not global
  * dedup), a pure-template document strips to the empty string, and
  * surviving segments reassemble in original position order. */
class BoilerplateSpec extends AnyFunSuite {
  import TestSpark._

  // exactly-16-token units so planted content aligns with segment cuts
  private def seg16(tag: String): String =
    (0 until 16).map(i => s"$tag$i").mkString(" ")

  private val header = seg16("hdr")
  private val footer = seg16("ftr")

  private val corpus: Seq[(String, Long, String)] = Seq(
    // source A: header in 3 docs (≥K), footer in 2 (≥K), bodies unique
    ("A", 1L, s"$header ${seg16("bodyOne")} $footer"),
    ("A", 2L, s"$header ${seg16("bodyTwo")} $footer"),
    ("A", 3L, s"$header ${seg16("bodyThree")}"),
    // source A: pure template — every segment is boilerplate
    ("A", 4L, header),
    // source B: the SAME header text appears once — below K within B,
    // so it must survive (scoping is per source, not global)
    ("B", 5L, s"$header ${seg16("bodyFive")}"),
    ("B", 6L, s"${seg16("bodySix")} ${seg16("tailSix")}")
  )

  private lazy val out = {
    import spark.implicits._
    Boilerplate.boilerplateStripFrom(
      corpus.toDF("source", "doc_id", "text").repartition(4), K = 2)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toMap
  }

  test("repeated segments stripped, order preserved, counts exact") {
    assert(out(1L) === (("A", 3L, 2L, seg16("bodyOne"))))
    assert(out(2L) === (("A", 3L, 2L, seg16("bodyTwo"))))
    assert(out(3L) === (("A", 2L, 1L, seg16("bodyThree"))))
  }

  test("pure-template document strips to empty string, not null") {
    assert(out(4L) === (("A", 1L, 1L, "")))
  }

  test("identical text in a different source below K survives") {
    assert(out(5L) === (("B", 2L, 0L, s"$header ${seg16("bodyFive")}")))
    assert(out(6L) === (("B", 2L, 0L, s"${seg16("bodySix")} ${seg16("tailSix")}")))
  }

  test("random corpora match a sequential reference strip (10 trials)") {
    import spark.implicits._
    val rng = new scala.util.Random(0xb01e)
    (1 to 10).foreach { trial =>
      val templates = (0 until 3).map(k => seg16(s"t${trial}x$k"))
      var uid = 0
      val docs = (0L until (6 + rng.nextInt(10)).toLong).map { id =>
        val blocks = (0 until 1 + rng.nextInt(5)).map { _ =>
          if (rng.nextBoolean()) templates(rng.nextInt(3))
          else { uid += 1; seg16(s"u${trial}x$uid") }
        }
        // sometimes a short (<16-word) tail segment
        val tail = if (rng.nextBoolean()) Seq(s"tail$id a b") else Nil
        (s"src${rng.nextInt(2)}", id, (blocks ++ tail).mkString(" "))
      }
      // sequential reference: 16-word chunks, per-source distinct-doc
      // counts, strip chunks in ≥2 docs of the same source
      val chunksOf = docs.map { case (src, id, t) =>
        (src, id, t.split(" ").grouped(16).map(_.mkString(" ")).toSeq)
      }
      // NB: not Map.collect{... => k} — tuple results rebuild a Map and
      // keys silently overwrite per source; keySet keeps every template
      val boiler = chunksOf.flatMap { case (src, id, cs) =>
        cs.distinct.map(c => (src, c) -> id)
      }.groupBy(_._1).filter { case (_, v) => v.map(_._2).distinct.size >= 2 }.keySet
      val expected = chunksOf.map { case (src, id, cs) =>
        id -> ((src, cs.size.toLong,
          cs.count(c => boiler((src, c))).toLong,
          cs.filterNot(c => boiler((src, c))).mkString(" ")))
      }.toMap
      val got = graft.ops.Boilerplate.boilerplateStripFrom(
        docs.toDF("source", "doc_id", "text").repartition(3), K = 2)
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
      assert(got === expected, s"trial $trial diverged")
    }
  }
}
