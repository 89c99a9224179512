package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, MapType, StringType}

/** The per-task scoring engine behind [[ClassifierScore]]: a dense
  * 4096-slot weight vector probed by md5-bucketed grams. One instance
  * rides the codegen `references` array (deserialized per task), so a
  * generated row pays exactly one virtual call; the md5 digest is
  * thread-local because a references object can be shared across a
  * local-mode scheduler's threads.
  *
  * Bucket contract (oracle parity): the SQL chain is
  * `conv(substr(md5(g), 1, 15), 16, 10) % 4096`. 4096 = 16³, so a
  * 15-hex-digit value mod 16³ is its last 3 hex digits — md5 hex chars
  * 13–15, i.e. byte 6 (both nibbles) and byte 7's HIGH nibble:
  * `((d6 & 0xFF) << 4) | ((d7 & 0xFF) >>> 4)`. No hex string is ever
  * formatted; the equivalence is spec-pinned against the SQL chain in
  * ClassifierScoreSpec (including multi-byte UTF-8 grams — md5 runs
  * over the same UTF-8 bytes both ways). */
final class ClassifierScorer(val weights: Array[Long], val dflt: Long)
    extends Serializable {
  require(weights.length == 4096, s"need 4096 weights, got ${weights.length}")

  def score(arr: ArrayData): Long = {
    val md = ClassifierScorer.digest.get()
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) acc += dflt
      else {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        acc += weights(((d(6) & 0xFF) << 4) | ((d(7) & 0xFF) >>> 4))
      }
      i += 1
    }
    acc
  }
}

object ClassifierScorer {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}

/** Native codegen expression: hashed-ngram linear-classifier weight sum
  * — `graft_classifier_score(grams, weightsMap, defaultW)` returns
  * Σ_g weights[conv(substr(md5(g),1,15),16,10) % 4096] over the gram
  * array, `defaultW` for buckets absent from the map (the production
  * neutral-prior slot) and for null elements.
  *
  * Replaces the s39/s49 interpreted scoring chain
  * `aggregate(transform(gr, g => coalesce(element_at(mapLit, …md5…),
  * 500000)), 0, +)`: higher-order functions are CodegenFallback, and
  * `element_at` on a map LITERAL is an O(|map|) scan — the old path
  * paid interpreted dispatch plus a 4096-entry linear probe per gram
  * occurrence. Here the foldable map folds ONCE (at plan construction)
  * into a dense 4096-slot long[] and each gram pays one md5 + one
  * array index inside whole-stage codegen. Integer weights sum in
  * array order, so the result is bit-identical to the old chain and to
  * the DuckDB oracle.
  *
  * The weight map must be FOLDABLE (a literal / collected artifact —
  * the broadcast-model discipline: vocabulary-sized, shipped with the
  * plan); scores stay a pure stateless per-row map, so the streaming
  * consumers keep zero state stores and the batch twin keeps one
  * narrow projection. */
final case class ClassifierScore(grams: Expression, weights: Expression,
    dflt: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(grams, weights, dflt)
  override def nullable: Boolean = grams.nullable
  override def foldable: Boolean = grams.foldable
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_classifier_score"

  override def checkInputDataTypes(): TypeCheckResult = grams.dataType match {
    case ArrayType(StringType, _) => weights.dataType match {
      case MapType(LongType, LongType, _) if weights.foldable =>
        if (dflt.foldable && dflt.dataType == LongType)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "graft_classifier_score default must be a foldable BIGINT")
      case other => TypeCheckResult.TypeCheckFailure(
        "graft_classifier_score weights must be a foldable MAP<BIGINT,BIGINT>, " +
          s"got ${other.simpleString} (foldable=${weights.foldable})")
    }
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_classifier_score requires ARRAY<STRING> grams, got ${other.simpleString}")
  }

  /** The folded model: dense bucket→weight vector, default-filled. */
  @transient private lazy val scorer: ClassifierScorer = {
    val d = dflt.eval().asInstanceOf[Long]
    val dense = Array.fill(4096)(d)
    val m = weights.eval().asInstanceOf[MapData]
    val ks = m.keyArray()
    val vs = m.valueArray()
    var i = 0
    while (i < m.numElements()) {
      val k = ks.getLong(i)
      if (k >= 0 && k < 4096) dense(k.toInt) = vs.getLong(i)
      i += 1
    }
    new ClassifierScorer(dense, d)
  }

  override def eval(input: InternalRow): Any = {
    val g = grams.eval(input)
    if (g == null) null else scorer.score(g.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("classifierScorer", scorer,
      classOf[ClassifierScorer].getName)
    val g = grams.genCode(ctx)
    ev.copy(code = code"""
      ${g.code}
      boolean ${ev.isNull} = ${g.isNull};
      long ${ev.value} = -1L;
      if (!${ev.isNull}) {
        ${ev.value} = $ref.score(${g.value});
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ClassifierScore =
    copy(grams = newChildren(0), weights = newChildren(1),
      dflt = newChildren(2))
}
