package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression: `graft_sign_project(e, i)` — the i-th
  * output coordinate of a ±1 sign random projection of `e: array<double>`.
  *
  * The projection matrix is a FORMULA, not data: cell (i, j) contributes
  * +e[j] when bit 10 of the LCG value `1103515245·(i·1009 + j) + 12345`
  * is 0, else −e[j] (the low LCG bits alternate, so the sign comes from
  * a middle bit). Both engines evaluate the identical integer
  * arithmetic, so the matrix needs no storage, no broadcast, and no
  * seed-plumbing — the q74 hash-split discipline applied to JL-style
  * dimensionality reduction.
  *
  * Numerical contract: the output accumulates ±e[j] in ARRAY ORDER with
  * IEEE double adds — the operation sequence of DuckDB's
  * `list_sum(list_transform(range(...), ...))` — so results are
  * bit-identical to the oracle (the graft_cosine contract). A decimal
  * formulation was tried first and lost: double→decimal(27,12) rounding
  * TIES resolve differently between the engines (observed 1-ulp drift at
  * sf0.01), while same-order double adds cannot drift.
  *
  * Why a custom Expression (brief option (b)): the `aggregate(...)` HOF
  * is CodegenFallback — interpreted dispatch per element; this generates
  * one tight Java loop via doGenCode and stays inside whole-stage
  * codegen, keeping the projection a pure narrow map (zero shuffle).
  *
  * `i` must be a foldable non-negative integer — it parameterizes the
  * plan, it is not data.
  */
final case class SignProject(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sign_project"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), IntegerType) if !right.foldable =>
        TypeCheckResult.TypeCheckFailure(
          "graft_sign_project requires a literal output-dim index")
      case (ArrayType(DoubleType, _), IntegerType) =>
        val i = right.eval()
        if (i == null || i.asInstanceOf[Int] < 0)
          TypeCheckResult.TypeCheckFailure(
            s"graft_sign_project requires a non-negative index, got $i")
        else TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_sign_project requires (array<double>, int), got " +
            s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val e = a.asInstanceOf[ArrayData]
    val i = b.asInstanceOf[Int]
    val n = e.numElements()
    var acc = 0.0
    var j = 0
    while (j < n) {
      val h = (1103515245L * (i.toLong * 1009L + j) + 12345L) / 1024L
      val x = e.getDouble(j)
      acc += (if ((h & 1L) == 0L) x else -x)
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val h = ctx.freshName("h")
      val x = ctx.freshName("x")
      s"""
        int $n = $a.numElements();
        double $acc = 0.0;
        for (int $j = 0; $j < $n; $j++) {
          long $h = (1103515245L * (((long) $b) * 1009L + $j) + 12345L) / 1024L;
          double $x = $a.getDouble($j);
          $acc += (($h & 1L) == 0L) ? $x : -$x;
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SignProject =
    copy(left = newLeft, right = newRight)
}
