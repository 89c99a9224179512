package graft.streaming

/** Per-drain micro-batch accounting for the bench's s-phase split
  * (VERDICT r12 item 4): under the 1-iteration s-phase accounting each
  * s-slot conflates state-store/session setup with per-batch operator
  * cost, which made carried s-slots read ~40% slower in r12 purely from
  * the accounting change. The drain reports, per bench query:
  *
  *  - `first` — seconds from stream start to the END of micro-batch 0
  *    (state-store init + the first batch's processing);
  *  - `batches` — micro-batches executed across the query's drains.
  *
  * The bench publishes `{total, first, steady = total − first, batches}`
  * per s-entry in BENCH_FULL so round-over-round s-trends compare
  * `steady` (operators) instead of setup. Single-batch AvailableNow
  * drains have steady ≈ post-processing only — `batches` disambiguates.
  *
  * Off by default (`enable()` is bench-only) so Verify/tests pay nothing.
  * Counters are cumulative across a query's possibly-multiple drains;
  * the bench resets per measured iteration. Single-threaded use (the
  * bench runs queries sequentially); atomics only for foreachBatch's
  * executor-thread callbacks.
  */
object StreamDrainStats {
  @volatile private var on = false
  private val firstNs = new java.util.concurrent.atomic.AtomicLong
  private val nBatches = new java.util.concurrent.atomic.AtomicLong

  def enable(): Unit = { on = true; reset() }
  def disable(): Unit = on = false
  def reset(): Unit = { firstNs.set(0); nBatches.set(0) }
  /** (first-batch seconds summed over this query's drains, batches). */
  def snapshot: (Double, Long) = (firstNs.get / 1e9, nBatches.get)

  private[graft] def active: Boolean = on
  private[graft] def addFirstBatch(ns: Long): Unit =
    firstNs.addAndGet(ns)
  private[graft] def addBatch(): Unit = nBatches.incrementAndGet()
}
