package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: polynomial rolling hash of a string —
  * fp = fold(codepoints, 0, (acc, c) => (acc·31 + c) mod 1e9+7).
  *
  * Replaces q34's `aggregate(split(text, ''), ...)` higher-order fold:
  * HOFs are CodegenFallback, so the old path paid interpreted expression
  * dispatch plus a materialized one-char-per-element array for EVERY
  * character of the corpus. This expression walks the string's code
  * points in one tight generated loop — no per-character allocation, and
  * it stays inside whole-stage codegen with the rest of the projection.
  *
  * Arithmetic contract (oracle parity): acc < 1e9+7, so acc·31 + c fits
  * a long with no overflow; the DuckDB oracle folds the identical
  * sequence (`unicode()` codepoints in order) in BIGINT.
  */
final case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_polyhash requires a string argument, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
        String $s = $c.toString();
        long $acc = 0L;
        int $i = 0;
        while ($i < $s.length()) {
          int $cp = $s.codePointAt($i);
          $acc = ($acc * 31L + $cp) % 1000000007L;
          $i += Character.charCount($cp);
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}
