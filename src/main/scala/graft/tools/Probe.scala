package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc local probe main — not part of the library surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val ev = spark.read.parquet(s"$dir/events.parquet")
    ev.printSchema()
    ev.show(3, truncate = false)
    spark.stop()
  }
}
