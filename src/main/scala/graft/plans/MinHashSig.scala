package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-lane MinHash signature kernel. Like [[CharNgramBuilder]], a
  * top-level object so generated Java calls the static forwarder
  * directly inside whole-stage codegen.
  *
  * Lane k of the signature is bit-identical to the SQL chain
  * `array_min(transform(s, x -> xxhash64(xxhash64(x), k)))`:
  * Spark's multi-child xxhash64 folds seeds left-to-right, so
  * `xxhash64(x)` = hash(utf8(x), seed 42) and `xxhash64(inner, k)` =
  * hashInt(k, hashLong(inner, 42)) — the same XXH64 primitives are
  * called here directly. The win is algorithmic, not just codegen: the
  * HOF chain re-hashes every shingle STRING once per lane (64 string
  * hashes per element, each through an interpreted lambda dispatch);
  * here each element's string is hashed ONCE and only the two cheap
  * integer mixes run per lane.
  *
  * Null elements fold exactly like the HOF chain (a null child leaves
  * the running seed untouched, so inner = 42); an empty array yields an
  * empty signature — callers filter `size(s) > 0` upstream, matching
  * the `array_min(empty) = null` row those filters already exclude. */
object MinHashSigBuilder {
  val Lanes = 64
  private val seedOfNull = 42L

  def build(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](0))
    val mins = new Array[Long](Lanes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val inner =
        if (arr.isNullAt(i)) seedOfNull
        else XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      val seed1 = XXH64.hashLong(inner, 42L)
      var k = 0
      while (k < Lanes) {
        val h = XXH64.hashInt(k, seed1)
        if (h < mins(k)) mins(k) = h
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(Long.box(_): Any))
  }
}

/** Native Catalyst expression: `graft_minhash_sig(s)` →
  * `array<bigint>` of the 64 MinHash lanes of `s: array<string>` —
  * the per-row (stream-side) sibling of the batch signature build's 64
  * codegen'd `min()` aggregates, for probes that must not shuffle
  * (s37's ingest tick). See [[MinHashSigBuilder]] for the exact-parity
  * contract with the interpreted HOF spelling it replaces. */
final case class MinHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig requires array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    MinHashSigBuilder.build(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.MinHashSigBuilder.build($a);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
