package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Computed-ONCE near-dup pair graph shared across the query suite
  * (VERDICT r7 item 2).
  *
  * Six queries consume the verified MinHash-LSH pair stream and/or its
  * connected-component labels (q26 pair audit, q50 clusters, q96
  * materialization, q114 survivorship, q241 cross-source matrix, q246
  * modularity). Before this object each of them re-ran the shingle →
  * signature → band-join → verify pipeline and (for four of them) the
  * label-propagation fixpoint from scratch — the single most expensive
  * computation in the batch suite, paid ~6×. A 100 TB deployment builds
  * the labeled pair graph ONCE per corpus snapshot and derives every
  * governance artifact from it; this registry expresses that shape
  * in-process.
  *
  * Mechanics: results are memoized per (session, sfDir) and materialized
  * via EAGER `localCheckpoint` — unlike `persist`, the checkpoint
  * truncates lineage and its blocks are NOT registered in
  * [[TrackedCaches]], so the harness's per-query `releaseAll()` (which
  * rightly drops each query's private caches) leaves the shared graph
  * alive for later queries in the same session. Entries die with their
  * session (block manager shutdown); stopped-session keys are evicted on
  * access. On a multi-executor cluster the same role is played by a
  * durable artifact — `checkpoint` to reliable storage or a parquet
  * pair/label index (the q91 persisted-index discipline) — because
  * localCheckpoint blocks die with an executor.
  *
  * `buildCount` exists so tests and the bench log can PROVE the fixpoint
  * ran once per run rather than trusting the design comment.
  */
object PairGraph {
  private val pairsMemo =
    scala.collection.mutable.Map.empty[(SparkSession, String), DataFrame]
  private val labelsMemo =
    scala.collection.mutable.Map.empty[(SparkSession, String), DataFrame]
  // Upstream MinHash artifacts, keyed (session, sfDir, nearCorpus?):
  // the shingle sets and the 32-band LSH bucket index. Memoized because
  // every probe-style consumer (q107 batch ingest, q261 incremental CC,
  // s37 streaming admission) needs the CORPUS side of these — at 100 TB
  // they are the persisted index a tick probes, never per-tick work.
  private val shinglesMemo =
    scala.collection.mutable.Map.empty[(SparkSession, String, Boolean), DataFrame]
  private val bandIndexMemo =
    scala.collection.mutable.Map.empty[(SparkSession, String, Boolean), DataFrame]
  @volatile private var builds = 0

  /** Number of from-scratch pair-stream builds this JVM (test hook). */
  def buildCount: Int = builds

  private def evictStopped(): Unit = {
    pairsMemo.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
    labelsMemo.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
    shinglesMemo.filterInPlace { case ((s, _, _), _) => !s.sparkContext.isStopped }
    bandIndexMemo.filterInPlace { case ((s, _, _), _) => !s.sparkContext.isStopped }
  }

  /** Near-dup-corpus shingle sets (doc_id, s), built at most once per
    * (session, sfDir). */
  def shingles(s: SparkSession, dir: String): DataFrame =
    shingleSets(s, dir, near = true)

  /** Plain-documents shingle sets — q107/s37's probe target. */
  def corpusShingles(s: SparkSession, dir: String): DataFrame =
    shingleSets(s, dir, near = false)

  /** Near-dup-corpus LSH band-bucket index (doc_id, band, bh). */
  def bandIndex(s: SparkSession, dir: String): DataFrame =
    bandIdx(s, dir, near = true)

  /** Plain-documents LSH band-bucket index — what an ingest tick probes. */
  def corpusBandIndex(s: SparkSession, dir: String): DataFrame =
    bandIdx(s, dir, near = false)

  private def shingleSets(
      s: SparkSession, dir: String, near: Boolean): DataFrame = synchronized {
    evictStopped()
    shinglesMemo.getOrElseUpdate((s, dir, near), {
      SharedBuilds.timed(if (near) "shingles" else "corpus-shingles") {
        Dedup.shingleSets(s, dir, near).localCheckpoint(true)
      }
    })
  }

  private def bandIdx(
      s: SparkSession, dir: String, near: Boolean): DataFrame = synchronized {
    evictStopped()
    bandIndexMemo.getOrElseUpdate((s, dir, near), {
      SharedBuilds.timed(if (near) "bands" else "corpus-bands") {
        Dedup.bandBuckets(shingleSets(s, dir, near)).localCheckpoint(true)
      }
    })
  }

  /** Verified near-dup pair stream (id_a < id_b, inter, uni; J ≥ 0.6),
    * built at most once per (session, sfDir). */
  def pairs(s: SparkSession, dir: String): DataFrame = synchronized {
    evictStopped()
    pairsMemo.getOrElseUpdate((s, dir), {
      builds += 1
      System.err.println(
        s"[pairgraph] building verified pair stream for $dir (build #$builds this JVM)")
      SharedBuilds.timed("pairs") {
        Dedup.minhashPairs(s, dir).localCheckpoint(true)
      }
    })
  }

  /** Connected-component labels (node, label) over [[pairs]], built at
    * most once per (session, sfDir). */
  def labels(s: SparkSession, dir: String): DataFrame = synchronized {
    evictStopped()
    labelsMemo.getOrElseUpdate((s, dir), {
      SharedBuilds.timed("cc-labels") {
        Dedup.connectedComponents(pairs(s, dir).select("id_a", "id_b"))
          .localCheckpoint(true)
      }
    })
  }

  /** Drop all memoized graphs and their blocks (test isolation hook). */
  def reset(): Unit = synchronized {
    (pairsMemo.values ++ labelsMemo.values ++ shinglesMemo.values ++
        bandIndexMemo.values).foreach(df =>
      try df.unpersist(blocking = false) catch { case _: Throwable => () })
    pairsMemo.clear()
    labelsMemo.clear()
    shinglesMemo.clear()
    bandIndexMemo.clear()
  }
}
