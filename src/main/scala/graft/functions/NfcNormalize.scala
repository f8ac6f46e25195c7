package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * canonicalization step a training corpus needs BEFORE exact/near dedup
  * and contamination checks: NFD/NFC variants of the same text ("é" vs
  * "e"+U+0301) hash differently, so unnormalized corpora silently leak
  * duplicates past md5/minhash and test-set n-grams past contamination
  * scans. Spark ships no normalization function; a Scala UDF would drop
  * the surrounding projection out of whole-stage codegen, so this is a
  * Catalyst `UnaryExpression` with `doGenCode` (the build brief's
  * preference order: built-ins > custom Expression > UDF).
  *
  * Both engines implement the same Unicode standard (JDK `java.text
  * .Normalizer` here, utf8proc behind DuckDB's `nfc_normalize`), so the
  * differential gate hash-checks the semantics. The already-normalized
  * fast path returns the INPUT UTF8String — for real corpora (mostly
  * ASCII) normalization is then an allocation-free verification scan. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    NfcNormalize.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  /** Shared by interpreted eval and generated code. */
  def nfc(v: UTF8String): UTF8String = {
    val s = v.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) v
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}
