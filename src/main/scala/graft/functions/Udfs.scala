package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** User-extensible function surface (SURVEY §2.9 last row): the engine's
  * registration points for scalar UDFs and typed UDAFs, demonstrated by
  * one of each. The reference has no user-function registry at all (its
  * only extension point is the transfer-type factory, base.py:73-108);
  * this is the analytics-side counterpart.
  *
  * Performance stance (per the builder brief): built-in Catalyst
  * functions beat UDFs — every operator query in this repo uses
  * built-ins. These exist to cover the extensibility surface, and the
  * UDAF shows the pattern for aggregations Catalyst genuinely lacks
  * (exact money arithmetic with a typed buffer).
  */
object Udfs {

  /** Typed UDAF: exact 2-decimal money sum. Buffer is unscaled cents
    * (Long) — exact, merge-associative, and tiny on the wire; the finish
    * step is ONE correctly-rounded decimal→double conversion, matching
    * `CAST(SUM(CAST(x AS DECIMAL(12,2))) AS DOUBLE)` bit-for-bit.
    */
  object ExactMoneySum extends Aggregator[Double, Long, Double] {
    override def zero: Long = 0L
    override def reduce(cents: Long, x: Double): Long =
      cents + JBigDecimal.valueOf(x).setScale(2, RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
    override def merge(a: Long, b: Long): Long = a + b
    override def finish(cents: Long): Double =
      JBigDecimal.valueOf(cents, 2).doubleValue()
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Scalar UDF: count of non-space characters. */
  val nonspaceLen: String => Int = s => s.count(_ != ' ')

  /** Register the function surface on a session (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.udf.register("exact_money_sum", org.apache.spark.sql.functions.udaf(ExactMoneySum))
    spark.udf.register("nonspace_len", nonspaceLen)
  }
}
