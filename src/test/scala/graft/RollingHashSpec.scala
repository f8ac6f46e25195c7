package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit contract of the `rolling_hash_windows` UDTF: window count and
  * positions, slide-vs-direct equality (each slid hash must equal the
  * hash computed fresh on that window alone — the classic Rabin-Karp
  * remove-term bug detector), injectivity on distinct grams, and the
  * NULL/short-input generator semantics. */
class RollingHashSpec extends AnyFunSuite {
  import TestSpark._

  private def windows(texts: Seq[String], l: Int) = {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), expr(s"rolling_hash_windows(text, $l)").as(Seq("pos", "h1", "h2")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), (r.getLong(2), r.getLong(3))))
  }

  test("window count, positions, and slide == direct") {
    val words = (0 until 9).map(i => s"w$i")
    val slid = windows(Seq(words.mkString(" ")), 4)
    assert(slid.map(_._2).toSeq === (0L to 5L)) // 9 − 4 + 1 windows, in order
    // hash each 4-window directly (single-window input exercises only the
    // initial polynomial, never the slide) and demand equality
    val direct = windows(words.sliding(4).map(_.mkString(" ")).toSeq, 4)
    for (((_, p, hSlid), (_, _, hDirect)) <- slid.zip(direct.sortBy(_._1)))
      assert(hSlid === hDirect, s"slide drift at pos $p")
  }

  test("equal grams collide, distinct grams do not") {
    val rows = windows(Seq("a b c a b c a b", "x a b c y"), 3)
    val byGram = rows.groupBy(_._3).view.mapValues(_.length).toMap
    // "a b c" appears 3× (twice in doc 0, once in doc 1) under one hash
    assert(byGram.values.count(_ == 3) === 1)
    // 8−3+1 + 5−3+1 = 9 windows; gram strings: doc0 has cyclic repeats
    assert(rows.length === 9)
    // distinct word runs ⇒ distinct (h1, h2) — exhaustive at this scale
    val gramsOf = Seq("a b c a b c a b", "x a b c y").flatMap(
      _.split(" ").sliding(3).map(_.mkString(" ")).toSeq)
    assert(byGram.size === gramsOf.distinct.size)
  }

  test("short and NULL inputs emit nothing; empty tokens count as words") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val rows = Seq((1L, "a b"), (2L, null), (3L, "a  b")) // "a  b" = 3 tokens
      .toDF("id", "text")
      .select(col("id"), expr("rolling_hash_windows(text, 3)").as(Seq("pos", "h1", "h2")))
      .collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(3L)) // only the 3-token doc
  }
}
