package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Computed-ONCE classifier feature/model artifacts shared across the
  * query suite — the [[PairGraph]] build-once discipline applied to
  * round 8's own shared intermediate (VERDICT r8 item 2).
  *
  * Five queries consume the corpus-wide hashed char-3gram frame and/or
  * the weight table derived from it (q255 inference, q262 perceptron
  * training, q264 DSIR selection, q268 calibration, s39 streaming
  * gate). Before this object each of them re-ran the explode → md5 →
  * bucket pipeline from scratch inside one session (~80% of each
  * query's cost was the rebuild). A 100 TB deployment featurizes the
  * corpus ONCE per snapshot and derives train/infer/select/audit from
  * the persisted feature frame; this registry expresses that shape
  * in-process.
  *
  * Mechanics are PairGraph's: memoized per (session, sfDir),
  * materialized via EAGER `localCheckpoint` so the harness's per-query
  * `TrackedCaches.releaseAll()` cannot drop the shared frame; entries
  * die with their session, stopped-session keys are evicted on access.
  * On a real cluster the same role is a durable parquet feature index
  * (localCheckpoint blocks die with an executor). `buildCount` exists
  * so a test can PROVE one gram build per session rather than trusting
  * this comment; builds are also noted in [[SharedBuilds]] so the
  * bench line names the consumer that paid.
  */
object ClassifierArtifacts {
  private val gramsMemo =
    scala.collection.mutable.Map.empty[(SparkSession, String), DataFrame]
  private val weightsMemo =
    scala.collection.mutable.Map.empty[(SparkSession, String), DataFrame]
  private val priorMemo =
    scala.collection.mutable.Map.empty[(SparkSession, String), DataFrame]
  @volatile private var builds = 0

  /** Number of from-scratch gram-frame builds this JVM (test hook). */
  def buildCount: Int = builds

  private def evictStopped(): Unit = {
    gramsMemo.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
    weightsMemo.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
    priorMemo.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
  }

  /** The gram-occurrence frame (doc_id, source, good, b), built at most
    * once per (session, sfDir). */
  def grams(s: SparkSession, dir: String): DataFrame = synchronized {
    evictStopped()
    gramsMemo.getOrElseUpdate((s, dir), {
      builds += 1
      System.err.println(
        s"[classifier] building gram frame for $dir (build #$builds this JVM)")
      SharedBuilds.timed("grams") {
        Profiling.classifierGrams(s, dir).localCheckpoint(true)
      }
    })
  }

  /** Smoothed per-bucket P(good) weight table (≤4096 rows), derived
    * from [[grams]], built at most once per (session, sfDir). */
  def weights(s: SparkSession, dir: String): DataFrame = synchronized {
    evictStopped()
    weightsMemo.getOrElseUpdate((s, dir),
      Profiling.classifierWeights(grams(s, dir)).localCheckpoint(true))
  }

  /** The gram-occurrence prior threshold (single row), built at most
    * once per (session, sfDir). */
  def prior(s: SparkSession, dir: String): DataFrame = synchronized {
    evictStopped()
    priorMemo.getOrElseUpdate((s, dir),
      Profiling.classifierPrior(grams(s, dir)).localCheckpoint(true))
  }

  /** Drop all memoized artifacts and their blocks (test isolation). */
  def reset(): Unit = synchronized {
    (gramsMemo.values ++ weightsMemo.values ++ priorMemo.values)
      .foreach(df =>
        try df.unpersist(blocking = false) catch { case _: Throwable => () })
    gramsMemo.clear()
    weightsMemo.clear()
    priorMemo.clear()
  }
}
