package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Gram kernel shared by interpreted eval and generated code. A top-level
  * Scala object compiles with static forwarders, so whole-stage-codegen'd
  * Java calls `graft.plans.NgramBuilder.build(s, n)` directly — the same
  * linkage Spark's own expressions use for their utility kernels. */
object NgramBuilder {
  /** Word n-grams of `s` split on the single-space delimiter, empty
    * tokens kept — exact parity with `split(text, ' ')` (Java
    * `split(" ", -1)`) and DuckDB `string_split`.
    *
    * Because the delimiter is one ASCII byte (0x20 never occurs inside a
    * UTF-8 multi-byte sequence), every gram is a contiguous BYTE SLICE of
    * the input — tokens i..i+n-1 plus the spaces already between them —
    * so the kernel scans the bytes once for token starts and copies
    * slices, with no per-token string materialization and no join. */
  def build(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    var spaces = 0
    var p = 0
    while (p < len) { if (bytes(p) == ' ') spaces += 1; p += 1 }
    val nToks = spaces + 1
    val count = nToks - n + 1
    if (count <= 0) return new GenericArrayData(new Array[Any](0))
    val starts = new Array[Int](nToks)
    var t = 1
    p = 0
    while (p < len) { if (bytes(p) == ' ') { starts(t) = p + 1; t += 1 }; p += 1 }
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      val from = starts(i)
      val until = if (i + n < nToks) starts(i + n) - 1 else len
      out(i) = UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, from, until))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst generator-feeder: `graft_word_ngrams(text, n)` →
  * `array<string>` of the text's word n-grams, for `explode(...)`.
  *
  * Replaces the posexplode + `lead()` over `Window.partitionBy(doc_id)`
  * gram construction in q63/q66: the window formulation shuffles EVERY
  * exploded token row on doc_id before a single gram exists — at corpus
  * scale that is an exchange of ~N_tokens rows doing work a narrow
  * per-row kernel does for free. With this expression the plan is
  * scan → project(ngrams) → generate(explode) → partial aggregate, with
  * no Exchange until the aggregate's own (already-reduced) shuffle — and
  * the kernel stays inside whole-stage codegen (HOF lambdas like
  * `transform(sequence(...))` are CodegenFallback; the r2 lesson).
  *
  * `n` must be a foldable positive integer — it parameterizes the plan,
  * it is not data. */
final case class WordNgrams(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_ngrams"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) if !right.foldable =>
        TypeCheckResult.TypeCheckFailure(
          "graft_word_ngrams requires a literal gram size")
      case (StringType, IntegerType) =>
        val n = right.eval()
        if (n == null || n.asInstanceOf[Int] < 1)
          TypeCheckResult.TypeCheckFailure(
            s"graft_word_ngrams requires a positive gram size, got $n")
        else TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_word_ngrams requires (string, int) arguments, got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(str: Any, n: Any): Any =
    NgramBuilder.build(str.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, n) =>
      s"${ev.value} = graft.plans.NgramBuilder.build($s, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordNgrams =
    copy(left = newLeft, right = newRight)
}
