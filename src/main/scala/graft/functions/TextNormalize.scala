package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * canonicalization pass a text corpus needs before hashing/dedup: the
  * same visible string must produce the same bytes whether it arrived
  * precomposed (é = U+00E9) or decomposed (e + U+0301). Both the JDK
  * (`java.text.Normalizer`) and the oracle's utf8proc implement the same
  * Unicode canonical composition, so normalized fingerprints are an exact
  * cross-engine contract.
  */
object TextNormalize {

  /** NFC-normalize a string column (null-safe, whole-stage codegen). */
  def nfc(c: Column): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(NfcNormalize(bridge.expression(c)))
  }

  /** Kernel shared by interpreted eval and generated code. */
  def nfcJava(s: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))
}

case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    TextNormalize.nfcJava(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextNormalize.nfcJava($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
