package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization — the first
  * stage of any text-dedup pipeline (composed vs decomposed code-point
  * sequences must hash identically or every downstream digest/fingerprint
  * silently treats "café" and "café" as different documents).
  *
  * Spark ships no normalization built-in, so the alternatives are a Scala
  * UDF (serialization overhead, opaque to codegen) or this: a one-call
  * expression over `java.text.Normalizer` that stays inside whole-stage
  * codegen. The JDK's ICU-derived normalizer matches DuckDB's
  * `nfc_normalize` (both implement UAX #15 NFC), which is what the
  * oracle checks.
  */
final case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_nfc requires a string argument, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      java.text.Normalizer.normalize(
        input.asInstanceOf[UTF8String].toString,
        java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
        ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
          java.text.Normalizer.normalize($c.toString(),
            java.text.Normalizer.Form.NFC));
      """
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
