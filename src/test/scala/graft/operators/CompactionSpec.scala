package graft.operators

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Unit tier for [[Compaction]] — the in-place partitioned rewrite and
  * the error paths the q62 oracle aggregate can't isolate. */
@graft.tags.Integration
class CompactionSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def tmpDir(): Path =
    Files.createTempDirectory("graft-compaction-spec")

  private def parquetCount(dir: Path): Int = {
    val s = Files.walk(dir)
    try s.filter(p => p.toString.endsWith(".parquet")).count().toInt
    finally s.close()
  }

  test("compactPartitioned preserves the hive layout and every row") {
    import spark.implicits._
    val root = tmpDir()
    // 3 partitions × 8 tiny files each — the streaming-sink accretion shape
    (1 to 300).map(i => (i.toLong, i % 3, s"v$i")).toDF("id", "gen", "v")
      .repartition(8)
      .write.partitionBy("gen").mode("overwrite").parquet(root.toString)
    val before = spark.read.parquet(root.toString)
      .agg(count(lit(1)), sum("id")).as[(Long, Long)].head()
    val nBefore = parquetCount(root)

    val report = Compaction.compactPartitioned(
      spark, root.toString, 64L * 1024 * 1024)

    assert(report.map(_._1).sorted == Seq("gen=0", "gen=1", "gen=2"),
      s"layout must survive; got ${report.map(_._1)}")
    report.foreach { case (part, nIn, nOut) =>
      assert(nOut < nIn, s"$part: $nIn -> $nOut files, expected a reduction")
      assert(nOut == 1, s"$part: 64 MB target over KB inputs must yield 1 file")
    }
    assert(parquetCount(root) < nBefore)
    // the partition column must still come from the directory structure
    val after = spark.read.parquet(root.toString)
    assert(after.columns.sorted.toSeq == Seq("gen", "id", "v"))
    assert(after.agg(count(lit(1)), sum("id")).as[(Long, Long)].head() == before)
    assert(after.filter(col("gen") === 1).count() == 100)
  }

  test("compactPartitioned leaves no staging debris behind") {
    import spark.implicits._
    val root = tmpDir()
    (1 to 50).map(i => (i, i % 2)).toDF("id", "gen")
      .repartition(4).write.partitionBy("gen").mode("overwrite")
      .parquet(root.toString)
    Compaction.compactPartitioned(spark, root.toString, 64L * 1024 * 1024)
    val s = Files.walk(root)
    val debris =
      try s.filter(p => p.getFileName.toString.startsWith(".compact-"))
        .count()
      finally s.close()
    assert(debris == 0, "staging dir must be deleted after the swap")
  }

  test("compactPartitioned on an unpartitioned flat dir compacts in place") {
    import spark.implicits._
    val root = tmpDir()
    (1 to 100).map(i => (i, s"r$i")).toDF("id", "v")
      .repartition(6).write.mode("overwrite").parquet(root.toString)
    val report = Compaction.compactPartitioned(
      spark, root.toString, 64L * 1024 * 1024)
    assert(report.map(_._1) == Seq(""),
      "a flat dir is a single leaf with an empty relative path")
    assert(report.head._2 == 6 && report.head._3 == 1)
    assert(spark.read.parquet(root.toString).count() == 100)
  }

  test("compactPartitioned fails loudly on a dir with no parquet files") {
    val root = tmpDir()
    Files.createFile(root.resolve("notes.txt"))
    val e = intercept[IllegalArgumentException] {
      Compaction.compactPartitioned(spark, root.toString, 1L << 20)
    }
    assert(e.getMessage.contains("no parquet files"))
  }

  test("compact fails loudly on an empty input dir") {
    val root = tmpDir()
    val e = intercept[IllegalArgumentException] {
      Compaction.compact(spark, root.toString,
        root.resolveSibling(root.getFileName.toString + "-out").toString,
        1L << 20)
    }
    assert(e.getMessage.contains("no parquet files"))
  }

  test("compact sizes the output from a RECURSIVE listing of a partitioned tree") {
    import spark.implicits._
    val in = tmpDir()
    val out = tmpDir().resolve("out")
    (1 to 200).map(i => (i, i % 4)).toDF("id", "gen")
      .repartition(5).write.partitionBy("gen").mode("overwrite")
      .parquet(in.toString)
    val (nIn, nOut) = Compaction.compact(
      spark, in.toString, out.toString, 64L * 1024 * 1024)
    assert(nIn == 20, s"4 partitions x 5 files, got $nIn")
    assert(nOut == 1)
    // flattening keeps the partition column as data via partition discovery
    assert(spark.read.parquet(out.toString)
      .agg(sum("id")).as[Long].head() == (1 to 200).map(_.toLong).sum)
  }

  test("dynamic partition overwrite touches only the rewritten partition (q95)") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val root = tmpDir()
    (1 to 200).map(i => (i.toLong, if (i % 2 == 0) "click" else "view"))
      .toDF("id", "t")
      .write.mode("overwrite").partitionBy("t").parquet(root.toString)
    def files(p: String): Map[String, java.nio.file.attribute.FileTime] = {
      val st = Files.walk(root.resolve(p))
      try st.iterator().asScala.filter(_.toString.endsWith(".parquet"))
        .map(f => f.toString -> Files.getLastModifiedTime(f)).toMap
      finally st.close()
    }
    val viewBefore = files("t=view")
    Thread.sleep(1100) // mtime granularity can be a full second
    (1 to 3).map(i => (i * 1000L, "click")).toDF("id", "t")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("t").parquet(root.toString)
    // the untouched partition: identical file set, identical mtimes
    assert(files("t=view") == viewBefore,
      "dynamic overwrite must not touch partitions absent from the write")
    // the rewritten partition: exactly the new rows
    val click = spark.read.parquet(root.toString)
      .filter(col("t") === "click").select("id").as[Long].collect().sorted
    assert(click.toSeq == Seq(1000L, 2000L, 3000L),
      s"click partition must hold only the backfill rows, got ${click.toSeq}")
  }
}
