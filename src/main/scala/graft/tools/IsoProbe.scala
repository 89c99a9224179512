package graft.tools

import graft.{GraftSession, SparkEntry}
import graft.operators.TrackedCaches

/** Times selected queries in isolation (fresh action, caches released
  * between queries) — the adjudication tool for bench entries whose
  * suite-run time exceeds their recorded floor: a query that re-measures
  * at floor here was heap/scheduler contention, not plan cost.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.IsoProbe <query …>
  */
object IsoProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.local(32, "graft-iso-probe")
    // untimed warmup: JIT + codegen + parquet footer caches
    SparkEntry.queries("q07_region_nation_revenue")(spark, sfDir).collect() // bounded: report-sized query output (probe drain)
    for (name <- args) {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).collect() // bounded: report-sized query output (probe drain)
        val s = (System.nanoTime() - t0) / 1e9
        TrackedCaches.releaseAll()
        s
      }
      println(f"ISO $name%-40s cold=${times.head}%6.2f  " +
        f"warm_min=${times.tail.min}%6.2f s")
    }
    spark.stop()
  }
}
