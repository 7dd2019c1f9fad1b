package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — canonical composition, the first step of
  * any text-dedup pipeline (decomposed "é" and composed "é"
  * must hash identically or every downstream exact/minhash/simhash stage
  * silently treats equal texts as distinct).
  *
  * Spark has no builtin for this (`lower`/`trim` are not normalization),
  * so it's the custom-Expression rung of the ladder: a thin codegen'd
  * wrapper over `java.text.Normalizer` that stays inside whole-stage
  * codegen (no UDF serialization boundary). DuckDB's `nfc_normalize`
  * mirrors it exactly, keeping the stage oracle-checkable. Already-NFC
  * strings (the overwhelming case in practice) short-circuit through
  * `Normalizer.isNormalized` without allocating.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Shared by eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
