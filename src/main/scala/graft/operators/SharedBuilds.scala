package graft.operators

/** Run-wide log of shared-artifact builds (ADVICE r8: PairGraph makes
  * suite timings order-dependent — the FIRST consumer of a memoized
  * artifact absorbs the whole build while later consumers run warm, so
  * a per-query number is only interpretable if the line says who paid).
  *
  * Every memoized registry ([[PairGraph]], [[ClassifierArtifacts]],
  * [[graft.operators.TextAnalysis.retrievalScores]]) notes a tag here
  * when it actually builds (memo miss). [[graft.Bench]] snapshots the
  * event count around each timed query and emits a
  * `"shared_builds":{"q114":"pairs",...}` map, so a reader can tell
  * "q114 took 5 s because it built the pair graph" from a genuine plan
  * regression without re-deriving the consumer order.
  */
object SharedBuilds {
  private val events = scala.collection.mutable.ArrayBuffer.empty[String]

  /** Record one from-scratch build of the named shared artifact. */
  def note(tag: String): Unit = synchronized { events += tag }

  /** Total build events this JVM (snapshot handle for [[since]]). */
  def count: Int = synchronized { events.size }

  /** Tags recorded after snapshot `n` (deduplicated, order kept). */
  def since(n: Int): Seq[String] = synchronized {
    events.drop(n).toList.distinct
  }
}
