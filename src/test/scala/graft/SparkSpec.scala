package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for all Spark-backed suites (JVM-wide;
  * sbt forks a single test JVM so suites share the warmup cost). */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = GraftSession.local(4, "graft-test")
    s
  }
}
