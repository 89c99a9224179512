package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** One operator exposed through [[graft.SparkEntry]].
  *
  * @param name   stable key; becomes the parquet dump name in Verify and the
  *               bench key in Bench.
  * @param run    (session, sfDir) => result. MUST be deterministic: every
  *               query ends in a full-key ORDER BY, and every derived numeric
  *               column goes through exact (decimal/integer) arithmetic so the
  *               DuckDB oracle hashes identically.
  * @param oracle equivalent DuckDB SQL over the same parquet tables; None for
  *               ops whose semantics DuckDB can't replicate bit-for-bit
  *               (hash-seeded sketches, side-effecting pipelines) — the driver
  *               then records a weaker rows-only check.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** Registry of DataFrames persisted INSIDE query definitions (shingle sets,
  * staged corpora, …). Queries `track` what they persist; the harness
  * (Verify/Bench) calls `releaseAll()` after each query's final action so
  * cached blocks don't accumulate across a 59-query session — within one
  * query the cache still prevents recomputation of expensive intermediates.
  */
object TrackedCaches {
  private val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  def track(df: DataFrame): DataFrame = synchronized { frames += df; df }
  def releaseAll(): Unit = synchronized {
    frames.foreach { f =>
      try f.unpersist(blocking = false) catch { case _: Throwable => () }
      CheckpointBlocks.release(f)
    }
    frames.clear()
  }
}

/** Frees the executor blocks behind an eagerly `localCheckpoint`ed frame.
  *
  * `Dataset.unpersist` only clears CacheManager (plan-cache) entries; a
  * checkpointed Dataset's plan is a `LogicalRDD` leaf whose BACKING RDD
  * holds the blocks, so unpersist is a no-op on it and the blocks live
  * until session stop (ADVICE r10: GramFrames.reset leaked them).
  *
  * Release ONLY when the frame's ROOT is the checkpoint leaf — i.e. the
  * frame is itself the result of `localCheckpoint` (exactly what callers
  * track/memoize). Walking ALL LogicalRDD leaves instead would also
  * free session-shared artifacts EMBEDDED in a tracked frame's plan
  * (a query that tracks `pairGraphMemo.join(...)` has the memo's leaf in
  * its tree), killing every later consumer of the memo with
  * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND — caught by the round-11 plan
  * snapshot on q261/q307 before it shipped.
  */
object CheckpointBlocks {
  def release(df: DataFrame): Unit =
    try df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        try lr.rdd.unpersist(blocking = false)
        catch { case _: Throwable => () }
      case _ => ()
    } catch { case _: Throwable => () }
}

/** Exact-arithmetic helpers shared by the operator definitions.
  *
  * Why: the driver's correctness gate hash-compares cell values against
  * DuckDB. Floating-point aggregation order differs between engines, so any
  * SUM/AVG over doubles is computed over exact decimals and only then cast
  * to double — `CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)` yields the
  * identical IEEE double in both engines (the decimal sum is exact and the
  * final cast is correctly rounded in both).
  */
object Exact {
  /** Money-ish column (2 fractional digits stored as double). */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))
  /** Small ratio column such as discount/tax (values 0.00-0.99). */
  def rate(c: Column): Column = c.cast(DecimalType(4, 2))
  /** Exact decimal literal 1.00 for (1 - discount)-style factors. */
  val one: Column = lit(java.math.BigDecimal.ONE).cast(DecimalType(3, 2))

  /** Exact sum of a 2-decimal double column, surfaced as double. */
  def dsum(c: Column): Column = sum(dec2(c)).cast(DoubleType)
  /** Exact mean = exact decimal sum / count, both deterministic doubles. */
  def davg(c: Column): Column = sum(dec2(c)).cast(DoubleType) / count(lit(1))
}
