package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Range-RLE deletion bitmap — the compressed per-file form a deletion
  * vector takes once a file's deleted-position count outgrows the
  * broadcast (path, pos) row list (graft.ops.DeletionVectors; the same
  * shape as Delta's RoaringBitmap DVs, realized as range-RLE so no
  * external jars are needed). Encoding: the sorted, coalesced runs of
  * deleted row indexes packed as big-endian (start: int64, len: int64)
  * pairs in ONE BinaryType value per file — a full-partition delete of a
  * billion-row file is 16 bytes; membership is a binary search over the
  * runs, codegen'd so the scan-side filter stays inside WholeStageCodegen.
  */
object RleBitmap {

  /** Pack sorted, non-overlapping (start, len) runs. */
  def encode(runs: Seq[(Long, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(runs.size * 16)
    runs.foreach { case (s, l) => bb.putLong(s); bb.putLong(l) }
    bb.array()
  }

  /** Coalesce a sorted distinct position list into runs, then pack. */
  def encodePositions(sorted: Seq[Long]): Array[Byte] = {
    val runs = Seq.newBuilder[(Long, Long)]
    var start = Long.MinValue
    var len = 0L
    sorted.foreach { p =>
      if (len > 0 && p == start + len) len += 1
      else {
        if (len > 0) runs += ((start, len))
        start = p; len = 1
      }
    }
    if (len > 0) runs += ((start, len))
    encode(runs.result())
  }

  /** Binary search over the packed runs (interpreter-path twin of the
    * generated code in [[RleContains.doGenCode]]). */
  def contains(bm: Array[Byte], pos: Long): Boolean = {
    var lo = 0
    var hi = bm.length / 16 - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val start = readLong(bm, mid * 16)
      if (pos < start) hi = mid - 1
      else if (pos < start + readLong(bm, mid * 16 + 8)) return true
      else lo = mid + 1
    }
    false
  }

  def readLong(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }

  /** Cardinality of the encoded bitmap (Σ run lengths) — audit helper. */
  def cardinality(bm: Array[Byte]): Long = {
    var n = 0L
    var off = 8
    while (off < bm.length) { n += readLong(bm, off); off += 16 }
    n
  }
}

/** `rle_contains(bitmap, pos)` — true iff `pos` is inside one of the
  * bitmap's runs. Fully codegen'd binary search. */
case class RleContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "rle_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    if ((left.dataType == BinaryType ||
          left.dataType == org.apache.spark.sql.types.NullType) &&
        (right.dataType == LongType ||
          right.dataType == org.apache.spark.sql.types.NullType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rle_contains requires (binary, bigint), got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def nullSafeEval(l: Any, r: Any): Any =
    RleBitmap.contains(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bm, pos) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      val st = ctx.freshName("st")
      val ln = ctx.freshName("ln")
      val found = ctx.freshName("found")
      val rd = ctx.freshName("rd")
      // local helper lambda is not available in Janino Java — inline the
      // big-endian long reads
      def readLongJava(arr: String, off: String): String =
        s"""(((long)($arr[$off] & 0xff) << 56) | ((long)($arr[$off + 1] & 0xff) << 48) |
           | ((long)($arr[$off + 2] & 0xff) << 40) | ((long)($arr[$off + 3] & 0xff) << 32) |
           | ((long)($arr[$off + 4] & 0xff) << 24) | ((long)($arr[$off + 5] & 0xff) << 16) |
           | ((long)($arr[$off + 6] & 0xff) << 8) | ((long)($arr[$off + 7] & 0xff)))""".stripMargin
      s"""
         |boolean $found = false;
         |int $lo = 0;
         |int $hi = $bm.length / 16 - 1;
         |while ($lo <= $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  int $rd = $mid * 16;
         |  long $st = ${readLongJava(bm, rd)};
         |  if ($pos < $st) { $hi = $mid - 1; }
         |  else {
         |    long $ln = ${readLongJava(bm, s"($rd + 8)")};
         |    if ($pos < $st + $ln) { $found = true; break; }
         |    $lo = $mid + 1;
         |  }
         |}
         |${ev.value} = $found;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
