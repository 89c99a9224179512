package graft.operators

import graft.GraftSession

/** Stage-level wall-clock probe for q261's incremental-CC pipeline
  * (diagnostic main, not part of the query surface): times each frame of
  * [[Dedup.incrementalCc]] separately so a regression can be pinned to
  * the stage that moved — standing build (PairGraph, session-shared),
  * delta banding + verify, subgraph fixpoint, or the final merge. */
object IncCcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.local(32, "graft-inccc-probe")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"INCCC $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    timed("warmup")(spark.read.parquet(s"$sfDir/documents.parquet").count())
    timed("standing pairs (PairGraph)")(PairGraph.pairs(spark, sfDir).count())
    timed("standing labels")(PairGraph.labels(spark, sfDir).count())
    val inc = timed("incrementalCc frames")(Dedup.incrementalCc(spark, sfDir))
    timed("newPairs")(inc.newPairs.count())
    val sub = timed("subEdges (persist+count)") {
      val e = inc.subEdges.persist(); e.count(); e
    }
    timed("fixpoint on warm subEdges") {
      Dedup.connectedComponents(sub, verbose = true).count()
    }
    timed("finalLabels")(inc.finalLabels.count())
    timed("q261 full query") {
      graft.SparkEntry.queries("q261_incremental_cc_maintenance")(spark, sfDir)
        .collect() // bounded: per-source report rows (diagnostic probe drain)
    }
    timed("q261 again (warm)") {
      graft.SparkEntry.queries("q261_incremental_cc_maintenance")(spark, sfDir)
        .collect() // bounded: per-source report rows (diagnostic probe drain)
    }
    TrackedCaches.releaseAll()
    spark.stop()
  }
}
