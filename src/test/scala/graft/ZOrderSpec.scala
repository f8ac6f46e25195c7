package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ExtraOps

class ZOrderSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val rows = ExtraOps.zorderCluster(spark, sf)
    .select("l_partkey", "l_suppkey", "zval")
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) // already z-ordered

  /** Independent bit-deinterleave — NOT the SQL formula the query and its
    * oracle share, so a shared misreading of the encoding can't pass here
    * (the differential gate's blind spot, SURVEY §7.4). */
  private def deinterleave(z: Long): (Long, Long) = {
    def compact(x0: Long): Long = {
      var x = x0 & 0x5555555555555555L
      x = (x | (x >> 1)) & 0x3333333333333333L
      x = (x | (x >> 2)) & 0x0F0F0F0F0F0F0F0FL
      x = (x | (x >> 4)) & 0x00FF00FF00FF00FFL
      x = (x | (x >> 8)) & 0x0000FFFF0000FFFFL
      x
    }
    (compact(z), compact(z >> 1))
  }

  test("zval round-trips: deinterleaving recovers (partkey & 1023, suppkey & 1023)") {
    rows.foreach { case (p, sKey, z) =>
      val (dp, ds) = deinterleave(z)
      assert(dp == (p & 1023L) && ds == (sKey & 1023L),
        s"z=$z decoded to ($dp,$ds), expected (${p & 1023L},${sKey & 1023L})")
    }
  }

  /** The locality claim, on a full 256×256 grid where both dimensions
    * carry real bit width (the testdata's 10-supplier dimension is too
    * narrow to show it — with one dimension's keyspace ≪ the other's, a
    * Morton sort degenerates toward the wide key's order, which is the
    * documented behavior, not a bug). Chunks of 256 consecutive z-ordered
    * cells must be ~16×16 tiles: BOTH per-chunk ranges tiny vs the 255
    * span, while an a-sorted layout leaves b unbounded per chunk. */
  test("z-order chunks are tiles: both dimensions bounded; single-key sort leaves one unbounded") {
    import org.apache.spark.sql.functions._
    val grid = spark.range(0, 256 * 256)
      .selectExpr("id % 256 AS a", "id DIV 256 AS b")
      .selectExpr("a", "b", s"CAST(${ExtraOps.zSparkSql("a", "b")} AS BIGINT) AS zval")
      .orderBy("zval").collect().map(r => (r.getLong(0), r.getLong(1)))
    val chunkSize = 256
    def avgRanges(seq: Array[(Long, Long)]): (Double, Double) = {
      val chunks = seq.grouped(chunkSize).toSeq
      (chunks.map(c => (c.map(_._1).max - c.map(_._1).min).toDouble).sum / chunks.length,
        chunks.map(c => (c.map(_._2).max - c.map(_._2).min).toDouble).sum / chunks.length)
    }
    val (za, zb) = avgRanges(grid)
    val (aa, ab) = avgRanges(grid.sortBy(identity))
    info(f"avg per-chunk ranges — z-order: a=$za%.1f b=$zb%.1f; a-sort: a=$aa%.1f b=$ab%.1f (span 255)")
    assert(za <= 16 && zb <= 16, s"z chunks should be ~16x16 tiles, got $za x $zb")
    assert(ab >= 200, "a-sorted chunks should leave b ~unbounded")
  }
}
