package graft.tools

import org.apache.spark.sql.DataFrame

/** Structural signature of a STREAMING query's pre-drain analyzed plan —
  * the plan-shape gate's unit of comparison for s-/p- queries (VERDICT
  * r12 item 3: PLANS.json guarded 360 batch plans and zero streaming/
  * pipeline ones, leaving watermark placement, the stateful-operator
  * set, and the sentinel-filter discipline free to regress silently).
  *
  * Counted from the ANALYZED logical plan (the optimizer hasn't run and
  * the physical plan doesn't exist until micro-batches execute, so the
  * analyzed tree is the stable pre-execution shape):
  *
  *  - `src`      streaming leaf relations (how many live streams feed it)
  *  - `wm`       EventTimeWatermark nodes — placement count; a dropped
  *               watermark flips state retention from bounded to forever
  *  - `agg`      Aggregate nodes (stateful when downstream of a stream)
  *  - `fmgws`    FlatMapGroupsWithState (custom state, typed API)
  *  - `tws`      TransformWithState (the Spark 4 StatefulProcessor API)
  *  - `dedup`    Deduplicate / DeduplicateWithinWatermark
  *  - `join`     Join nodes (stream-stream or stream-static)
  *  - `union`    Union nodes
  *  - `filter`   Filter nodes — the flush-sentinel discipline (uid < 0
  *               drops) lives here; losing one changes this count
  *
  * plus the drain's output mode. A query may drain several streams; its
  * committed signature is the ORDERED list of per-drain signatures.
  */
final case class StreamSig(mode: String, src: Int, wm: Int, agg: Int,
    fmgws: Int, tws: Int, dedup: Int, join: Int, union: Int, filter: Int) {
  def json: String =
    s"""{"mode":"$mode","src":$src,"wm":$wm,"agg":$agg,"fmgws":$fmgws,""" +
      s""""tws":$tws,"dedup":$dedup,"join":$join,"union":$union,""" +
      s""""filter":$filter}"""
}

object StreamSig {
  def of(df: DataFrame, mode: String): StreamSig = {
    val nodes = df.queryExecution.analyzed.collect { case n => n }
    def c(names: String*): Int =
      nodes.count(n => names.contains(n.getClass.getSimpleName))
    StreamSig(
      mode = mode,
      src = nodes.count(n => n.children.isEmpty && n.isStreaming),
      wm = c("EventTimeWatermark"),
      agg = c("Aggregate"),
      fmgws = c("FlatMapGroupsWithState"),
      tws = c("TransformWithState"),
      dedup = c("Deduplicate", "DeduplicateWithinWatermark"),
      join = c("Join"),
      union = c("Union"),
      filter = c("Filter"))
  }
}

/** Capture hook the drains call. Off by default — Verify, the bench and
  * the correctness gate pay a single volatile read per drain; only the
  * PlanSnapshot generator and PlanShapeSpec enable it. */
object StreamPlanCapture {
  @volatile private var on = false
  private val buf = scala.collection.mutable.ArrayBuffer.empty[StreamSig]

  def enable(): Unit = synchronized { on = true; buf.clear() }
  def disable(): Unit = synchronized { on = false; buf.clear() }
  /** Drain the captured signatures (ordered as recorded) and clear. */
  def take(): Seq[StreamSig] = synchronized { val r = buf.toList; buf.clear(); r }
  def record(df: DataFrame, mode: String): Unit = if (on) {
    val sig = StreamSig.of(df, mode) // outside the lock: plan walk
    synchronized { if (on) buf += sig }
  }
}
