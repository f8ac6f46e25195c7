package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels as native codegen expressions.
  *
  * The declarative formulation (8 subspaces × 16 centroids × 8 dims of
  * `element_at` arithmetic per row) generates ~20k lines of Java and
  * trips janino's 64 KB method limit — Spark silently falls back to
  * INTERPRETED expression evaluation, which measured ~6 s for the code
  * assignment over 50k vectors at sf0.1. These expressions generate a
  * three-deep Java loop instead (the same escape hatch as [[ArrayDot]]):
  * small bytecode, JIT-hot, and the whole stage stays codegen'd.
  *
  * All three take the FLAT codebook (m·c·sub longs, subspace-major) as a
  * literal array child, so the driver-collected 8 KB codebook rides the
  * plan like any literal. Geometry (m, c, sub) is constructor metadata.
  */
abstract class PqKernel extends BinaryExpression {
  /** (left element type, right element type) both arrays. */
  protected def elemTypes: (DataType, DataType)
  override def nullable: Boolean = left.nullable || right.nullable

  /** Geometry guard: UnsafeArrayData does NO bounds checking, so an
    * undersized vector/codebook/code array would read adjacent memory
    * and return silently-wrong distances instead of failing. One length
    * compare per row (vs m·c·sub multiply-adds) is noise. */
  @inline protected final def requireLen(
      a: ArrayData, expected: Int, what: String): Unit =
    if (a.numElements() != expected)
      throw new IllegalArgumentException(
        s"$prettyName: $what must have $expected elements, got ${a.numElements()}")
  override def checkInputDataTypes(): TypeCheckResult = {
    val (lt, rt) = elemTypes
    val ok = (left.dataType, right.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _)) => a == lt && b == rt
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<${lt.simpleString}>, array<${rt.simpleString}>), got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
}

/** pq_encode(q, cb): nearest-centroid code per subspace — array<int> of
  * length m; ties resolve to the LOWEST centroid index (scan order). */
case class PqEncode(left: Expression, right: Expression, m: Int, c: Int, sub: Int)
  extends PqKernel {
  override def prettyName: String = "pq_encode"
  override protected def elemTypes: (DataType, DataType) = (LongType, LongType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(q: Any, cb: Any): Any = {
    val qa = q.asInstanceOf[ArrayData]; val cba = cb.asInstanceOf[ArrayData]
    requireLen(qa, m * sub, "vector"); requireLen(cba, m * c * sub, "codebook")
    val out = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var best = Long.MaxValue; var bestC = 0; var ci = 0
      while (ci < c) {
        var s = 0L; var j = 0
        while (j < sub) {
          val diff = qa.getLong(mi * sub + j) - cba.getLong((mi * c + ci) * sub + j)
          s += diff * diff; j += 1
        }
        if (s < best) { best = s; bestC = ci }
        ci += 1
      }
      out(mi) = bestC; mi += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, cb) => {
      val out = ctx.freshName("out")
      val mi = ctx.freshName("mi"); val ci = ctx.freshName("ci"); val j = ctx.freshName("j")
      val best = ctx.freshName("best"); val bestC = ctx.freshName("bestC")
      val s = ctx.freshName("s"); val diff = ctx.freshName("diff")
      s"""
         |if ($q.numElements() != ${m * sub} || $cb.numElements() != ${m * c * sub})
         |  throw new IllegalArgumentException("pq_encode: need vector[${m * sub}]"
         |    + " and codebook[${m * c * sub}], got " + $q.numElements() + ", " + $cb.numElements());
         |int[] $out = new int[$m];
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  long $best = Long.MAX_VALUE; int $bestC = 0;
         |  for (int $ci = 0; $ci < $c; $ci++) {
         |    long $s = 0L;
         |    for (int $j = 0; $j < $sub; $j++) {
         |      long $diff = $q.getLong($mi * $sub + $j)
         |        - $cb.getLong(($mi * $c + $ci) * $sub + $j);
         |      $s += $diff * $diff;
         |    }
         |    if ($s < $best) { $best = $s; $bestC = $ci; }
         |  }
         |  $out[$mi] = $bestC;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** pq_table(q, cb): the query's full ADC lookup table — array<long> of
  * m·c squared distances, laid out subspace-major to match pq_adc. */
case class PqTable(left: Expression, right: Expression, m: Int, c: Int, sub: Int)
  extends PqKernel {
  override def prettyName: String = "pq_table"
  override protected def elemTypes: (DataType, DataType) = (LongType, LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(q: Any, cb: Any): Any = {
    val qa = q.asInstanceOf[ArrayData]; val cba = cb.asInstanceOf[ArrayData]
    requireLen(qa, m * sub, "vector"); requireLen(cba, m * c * sub, "codebook")
    val out = new Array[Long](m * c)
    var mi = 0
    while (mi < m) {
      var ci = 0
      while (ci < c) {
        var s = 0L; var j = 0
        while (j < sub) {
          val diff = qa.getLong(mi * sub + j) - cba.getLong((mi * c + ci) * sub + j)
          s += diff * diff; j += 1
        }
        out(mi * c + ci) = s; ci += 1
      }
      mi += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, cb) => {
      val out = ctx.freshName("out")
      val mi = ctx.freshName("mi"); val ci = ctx.freshName("ci"); val j = ctx.freshName("j")
      val s = ctx.freshName("s"); val diff = ctx.freshName("diff")
      s"""
         |if ($q.numElements() != ${m * sub} || $cb.numElements() != ${m * c * sub})
         |  throw new IllegalArgumentException("pq_table: need vector[${m * sub}]"
         |    + " and codebook[${m * c * sub}], got " + $q.numElements() + ", " + $cb.numElements());
         |long[] $out = new long[${m * c}];
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  for (int $ci = 0; $ci < $c; $ci++) {
         |    long $s = 0L;
         |    for (int $j = 0; $j < $sub; $j++) {
         |      long $diff = $q.getLong($mi * $sub + $j)
         |        - $cb.getLong(($mi * $c + $ci) * $sub + $j);
         |      $s += $diff * $diff;
         |    }
         |    $out[$mi * $c + $ci] = $s;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** pq_adc(qtab, codes): asymmetric distance — m lookups into the query
  * table at the corpus row's codes, summed. The per-candidate hot path. */
case class PqAdc(left: Expression, right: Expression, m: Int, c: Int)
  extends PqKernel {
  override def prettyName: String = "pq_adc"
  override protected def elemTypes: (DataType, DataType) = (LongType, IntegerType)
  override def dataType: DataType = LongType

  override protected def nullSafeEval(qtab: Any, codes: Any): Any = {
    val ta = qtab.asInstanceOf[ArrayData]; val ca = codes.asInstanceOf[ArrayData]
    requireLen(ta, m * c, "query table"); requireLen(ca, m, "codes")
    var s = 0L; var mi = 0
    while (mi < m) {
      val code = ca.getInt(mi)
      if (code < 0 || code >= c)
        throw new IllegalArgumentException(
          s"pq_adc: code $code out of range [0, $c) at subspace $mi")
      s += ta.getLong(mi * c + code); mi += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (qtab, codes) => {
      val s = ctx.freshName("s"); val mi = ctx.freshName("mi")
      val code = ctx.freshName("code")
      s"""
         |if ($qtab.numElements() != ${m * c} || $codes.numElements() != $m)
         |  throw new IllegalArgumentException("pq_adc: need qtab[${m * c}] and codes[$m],"
         |    + " got " + $qtab.numElements() + ", " + $codes.numElements());
         |long $s = 0L;
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  int $code = $codes.getInt($mi);
         |  if ($code < 0 || $code >= $c)
         |    throw new IllegalArgumentException("pq_adc: code " + $code + " out of range");
         |  $s += $qtab.getLong($mi * $c + $code);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
