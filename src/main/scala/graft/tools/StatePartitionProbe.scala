package graft.tools

import graft.{GraftSession, SparkEntry}
import graft.operators.TrackedCaches

/** Measures how `spark.sql.shuffle.partitions` drives the cost of the
  * state-store-heavy streaming queries (VERDICT r06 item 4: s19's 13.75 s
  * isolated floor looked like per-partition state-store overhead — each
  * stateful operator opens one store per shuffle partition per micro-batch,
  * so a multi-batch AvailableNow drain pays partitions × stores × batches
  * store initializations regardless of data volume).
  *
  * Each query runs twice per partition setting (fresh checkpoint per run —
  * the drain helper allocates one), reporting the min. Shuffle partitions
  * are session-conf-settable at runtime; a streaming query binds the value
  * at its first batch, and every drain starts a fresh query, so looping
  * settings inside one session is sound.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.StatePartitionProbe \
  *          [query …]   (default: s19, s24, s27)
  */
object StatePartitionProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val queries =
      if (args.nonEmpty) args.toSeq
      else Seq("s19_stream_retention", "s24_stream_heavy_hitters",
        "s27_transform_with_state")
    val spark = GraftSession.local(32, "graft-state-partition-probe")
    // untimed warmup
    SparkEntry.queries("q07_region_nation_revenue")(spark, sfDir).collect() // bounded: report-sized query output (probe drain)
    for (name <- queries; parts <- Seq(32, 16, 8, 4)) {
      // the drain helper binds stateful operators to this knob (and
      // restores the session's shuffle partitions afterwards)
      spark.conf.set("spark.graft.stream.statePartitions", parts.toString)
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).collect() // bounded: report-sized query output (probe drain)
        val s = (System.nanoTime() - t0) / 1e9
        TrackedCaches.releaseAll()
        s
      }
      println(f"PROBE $name%-28s parts=$parts%2d  min=${times.min}%6.2f s" +
        f"  (runs: ${times.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
