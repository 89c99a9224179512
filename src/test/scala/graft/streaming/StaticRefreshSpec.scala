package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Pins the TRUE refresh semantics of a stream-static parquet join —
  * the sharp edge the s05/s06 comments point at: the static side's SCAN
  * re-executes per micro-batch, but over the file listing captured at
  * query PLANNING. An in-place overwrite of the dimension therefore does
  * NOT refresh it — the next batch fails on the vanished old part files.
  * A dimension that must refresh in-flight is re-read inside
  * foreachBatch (s10's pattern) or served by a snapshot-isolated table
  * format.
  */
@graft.tags.Integration
class StaticRefreshSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("static parquet dim does NOT refresh: in-place overwrite breaks the next batch") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-static-refresh")
    val streamDir = root.resolve("stream")
    val dimDir = root.resolve("dim")
    val outDir = root.resolve("out")
    Files.createDirectories(streamDir)
    Seq((1L, "a")).toDF("k", "payload").coalesce(1)
      .write.parquet(streamDir.resolve("f1").toString)
    Seq((1L, "dim_v1")).toDF("k", "label").coalesce(1)
      .write.mode("overwrite").parquet(dimDir.toString)

    val schema = spark.read.parquet(streamDir.resolve("f1").toString).schema
    val dim = spark.read.schema("k BIGINT, label STRING").parquet(dimDir.toString)
    val joined = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(streamDir.toString + "/*")
      .join(dim, "k")
    @volatile var flipped = false
    val q = joined.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.write.mode("append").parquet(outDir.toString)
        if (!flipped) {
          flipped = true
          // dimension overwritten in place; a second stream file arrives
          Seq((1L, "dim_v2")).toDF("k", "label").coalesce(1)
            .write.mode("overwrite").parquet(dimDir.toString)
          Seq((1L, "b")).toDF("k", "payload").coalesce(1)
            .write.parquet(streamDir.resolve("f2").toString)
        }
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
      .start()
    try {
      val deadline = System.nanoTime() + 90L * 1000000000L
      while (q.exception.isEmpty && System.nanoTime() < deadline) Thread.sleep(500)
      // batch 1 joined v1 before the overwrite
      val labels = spark.read.schema("k BIGINT, payload STRING, label STRING")
        .parquet(outDir.toString)
        .select("payload", "label").as[(String, String)].collect().toMap
      assert(labels.get("a").contains("dim_v1"), s"batch 1 must join v1: $labels")
      // batch 2 must NOT have silently joined stale or fresh data — the
      // planning-time file listing points at vanished files and the query
      // dies loudly instead
      val err = q.exception
      assert(err.isDefined, "in-place dim overwrite must fail the query, not refresh it")
      assert(err.get.getMessage.contains("FAILED_READ_FILE")
        || err.get.getMessage.contains("does not exist"),
        s"expected a vanished-file failure, got: ${err.get.getMessage.take(200)}")
    } finally q.stop()
  }
}
