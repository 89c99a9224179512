package graft.tools

import graft.{GraftSession, SparkEntry}

/** Prints the formatted physical plan of selected queries (all, if no
  * args) for scale auditing: check PushedFilters reach the scans,
  * ReadSchema is pruned, small dims broadcast, no CartesianProduct on
  * big sides, WholeStageCodegen spans are wide.
  *
  * Usage: runMain graft.tools.PlanAudit [sfDir] [query ...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local(4, "graft-plan-audit")
    for (n <- names) {
      println(s"\n########## $n ##########")
      try println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"EXPLAIN FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
