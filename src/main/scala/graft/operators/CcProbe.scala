package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Diagnostic: per-stage timing of the q50 pipeline (shingle → LSH
  * candidates → verify → connected components), to localize which stage
  * an anomalous bench reading comes from.
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.operators.CcProbe
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.local(32, "graft-cc-probe")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"CCPROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    timed("warmup")(spark.read.parquet(s"$sfDir/documents.parquet").count())
    val pairs = timed("minhashPairs(count)") {
      val p = Dedup.minhashPairs(spark, sfDir).select("id_a", "id_b")
      p.persist(); p.count(); p
    }
    timed("connectedComponents") {
      Dedup.connectedComponents(pairs, verbose = true).count()
    }
    TrackedCaches.releaseAll()
    spark.stop()
  }
}
