package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime helper for [[NfcNormalize]] — a plain object so the generated
  * Java calls the static forwarder `graft.functions.NfcUtil.nfc(...)`. */
object NfcUtil {
  /** Unicode NFC normalization. Pure-ASCII input (bytes == chars in UTF-8)
    * returns the buffer untouched with ZERO allocation — the dominant case
    * in a 100 TB mostly-ASCII corpus pass; non-ASCII already-NFC text pays
    * one String decode for the `isNormalized` check but allocates no copy. */
  def nfc(u: UTF8String): UTF8String = {
    if (u.numBytes == u.numChars) return u // ASCII is always NFC
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}

/** Native Catalyst expression: Unicode NFC normalization of a string column —
  * the standard first step of multilingual corpus cleaning (decomposed
  * `e + U+0301` and composed `é` must fingerprint/dedup/tokenize as the SAME
  * text, or every accented near-duplicate silently escapes the dedup pass).
  *
  * An Expression (with codegen) rather than a UDF so it stays inside
  * whole-stage codegen like Spark's own string expressions: no closure
  * serialization, no per-row encoder round-trip; the common already-NFC case
  * costs one verification scan and zero allocation (see [[NfcUtil.nfc]]).
  * Null in → null out (standard unary null semantics). */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType match {
    case s: StringType => s
    // a NULL literal resolves to NullType; standard string functions accept
    // it and return null rather than failing analysis
    case org.apache.spark.sql.types.NullType => StringType
    case other => throw new IllegalArgumentException(
      s"nfc_normalize expects a string column, got ${other.simpleString}")
  }

  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcUtil.nfc(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcUtil.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
