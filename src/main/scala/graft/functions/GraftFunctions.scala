package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the hot numeric kernels (SURVEY.md §7.5;
  * preference order per the build brief: built-ins > custom Expression >
  * custom plan > mapPartitions).
  *
  * The built-in higher-order-function route for a dot product —
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — materializes an
  * intermediate array and runs lambda interpretation per element, and it
  * breaks whole-stage codegen. [[ArrayDot]] is a single fused loop over the
  * two `ArrayData` buffers with full `doGenCode` support, so an all-pairs
  * cosine stage stays inside one WholeStageCodegen span. Measured ~20×
  * faster than the HOF route on the sf0.1 all-pairs cosine workload.
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case org.apache.spark.sql.types.NullType => true // NULL literal → null result
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_dot requires two array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  // a null ELEMENT nulls the whole result (matches the null-propagating HOF
  // equivalent aggregate(zip_with(a,b,_*_),...) — getDouble on a null slot
  // would otherwise silently read 0.0)
  override def nullable: Boolean = true

  // Length mismatch ⇒ null, matching the built-in equivalent
  // aggregate(zip_with(a,b,_*_), 0.0, _+_): zip_with null-pads the shorter
  // array, the products go null, and the sum is null. Keeping the
  // semantics identical is what makes plans.FuseArrayDot's rewrite safe.
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |if ($b.numElements() != $n) { ${ev.isNull} = true; }
         |else for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object GraftFunctions {

  private def asInt(e: Expression): Int = e.eval().asInstanceOf[Number].intValue()

  /** The ONE name → (implementing class, builder) table both registration
    * paths share — [[register]] (live sessions) and [[GraftExtensions]]
    * (session-build injection) previously each hand-listed all nine
    * builders, a copy-paste pair that had already drifted stylistically
    * and would eventually drift semantically. */
  private[functions] val defs: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("array_dot", classOf[ArrayDot],
      exprs => ArrayDot(exprs.head, exprs(1))),
    ("misra_gries", classOf[MisraGriesAgg],
      exprs => MisraGriesAgg(exprs.head, asInt(exprs(1)))),
    ("simhash_sums", classOf[SimhashSumsAgg],
      exprs => SimhashSumsAgg(exprs.head, exprs(1), exprs(2), exprs(3))),
    ("pq_encode", classOf[PqEncode],
      exprs => PqEncode(exprs.head, exprs(1), asInt(exprs(2)), asInt(exprs(3)), asInt(exprs(4)))),
    ("pq_table", classOf[PqTable],
      exprs => PqTable(exprs.head, exprs(1), asInt(exprs(2)), asInt(exprs(3)), asInt(exprs(4)))),
    ("pq_adc", classOf[PqAdc],
      exprs => PqAdc(exprs.head, exprs(1), asInt(exprs(2)), asInt(exprs(3)))),
    ("topk_min", classOf[TopKMinAgg],
      exprs => TopKMinAgg(exprs.head, exprs(1), asInt(exprs(2)))),
    ("topk_min_distinct", classOf[TopKMinAgg],
      exprs => TopKMinAgg(exprs.head, exprs(1), asInt(exprs(2)), distinct = true)),
    ("word_ngrams", classOf[WordNgrams],
      exprs => WordNgrams(exprs.head, exprs(1))),
    ("rolling_hash_windows", classOf[RollingHashWindows],
      exprs => RollingHashWindows(exprs.head, exprs(1))),
    ("rle_contains", classOf[RleContains],
      exprs => RleContains(exprs.head, exprs(1))),
    ("nfc_normalize", classOf[NfcNormalize],
      exprs => NfcNormalize(exprs.head)))

  /** Register the custom expressions with the session. Idempotent AND
    * quiet: a name already present is left alone only after an OWNERSHIP
    * check — the registered ExpressionInfo must name the graft
    * implementing class (both registration paths attach it: here and
    * [[GraftExtensions]]'s injectFunction). A name held by a FOREIGN
    * implementation fails loudly instead of silently running foreign
    * semantics under graft's queries (re-registering over it would be
    * just as wrong in the other direction — the embedder's own queries
    * would silently change meaning). Skipping our own prior registration
    * keeps bench/verify logs free of per-call "replaced a previously
    * registered function" WARNs. */
  def register(s: SparkSession): Unit = {
    val reg = s.sessionState.functionRegistry
    defs.foreach { case (name, cls, builder) =>
      val id = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
      reg.lookupFunction(id) match {
        case None =>
          reg.registerFunction(id,
            new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
              cls.getName, name), builder)
        case Some(info) if info.getClassName == cls.getName => () // ours: keep
        case Some(info) =>
          throw new IllegalStateException(
            s"function name '$name' is already registered by a foreign " +
              s"implementation (${info.getClassName}); refusing to run graft " +
              s"queries over foreign semantics — unregister it or rename the " +
              s"collision before initializing graft")
      }
    }
  }

  /** Fused dot product over two array<double> columns (codegen'd). */
  def arrayDot(s: SparkSession, a: Column, b: Column): Column = {
    register(s)
    call_function("array_dot", a, b)
  }

  /** Range-RLE deletion-bitmap membership (codegen'd binary search). */
  def rleContains(s: SparkSession, bm: Column, pos: Column): Column = {
    register(s)
    call_function("rle_contains", bm, pos)
  }
}
