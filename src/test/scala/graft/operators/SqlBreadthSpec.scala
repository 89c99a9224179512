package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkSpec, Tables}

/** Semantic pins for the SQL-surface breadth operators beyond the
  * value-hash oracle: three-valued-logic corner cases, bitmap-merged
  * distinct vs a direct countDistinct, and collation grouping vs an
  * explicit lower(). Runs at sf0.001.
  */
class SqlBreadthSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q169 null-safe equality counts both-null rows that plain = drops") {
    import spark.implicits._
    val rows = run("q169_null_semantics")
      .as[(String, Long, Long, Long, Long, Long, String)].collect()
    val bothNull = rows.find(_._1 == "-").get
    // rf='N' AND ls='O' rows: a and b both null — <=> is true, = is null
    assert(bothNull._2 > 0)
    assert(bothNull._3 == 0 && bothNull._4 == 0, "'-' group is the all-null group")
    assert(bothNull._5 == bothNull._2, "<=> counts every both-null row")
    assert(bothNull._6 == 0, "plain = never counts a null comparison")
    rows.foreach(r => assert(r._5 >= r._6, "null-safe eq is never rarer than ="))
  }

  test("q170 bitmap-merged distinct equals a direct countDistinct") {
    import spark.implicits._
    val got = run("q170_bitmap_distinct")
      .as[(String, Long, Long)].collect().toSet
    val direct = Tables.events(spark, dir)
      .select(col("event_type"), expr("ts_us div 86400000000").as("day"),
        col("user_id"))
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n_users"),
        expr("count(distinct day, user_id)").as("user_days"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == direct, "bitmap OR-merge must be exact, not approximate")
    assert(got.forall { case (_, n, ud) => ud >= n },
      "user-days dominate distinct users")
  }

  test("q175 writes really go through each codec (file extensions carry it)") {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val rows = run("q175_codec_roundtrip").as[(String, Long, Long)].collect()
    assert(rows.map(_._1).toSeq == Seq("gzip", "snappy", "zstd"))
    assert(rows.map(_._2).distinct.size == 1, "all codecs see the same rows")
    assert(rows.map(_._3).distinct.size == 1, "all codecs hash identically")
    val base = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_codec_roundtrip", spark.sparkContext.applicationId)
    Seq("gzip" -> ".gz.parquet", "snappy" -> ".snappy.parquet",
        "zstd" -> ".zstd.parquet").foreach { case (codec, ext) =>
      val files = Files.list(base.resolve(codec)).iterator().asScala
        .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSeq
      assert(files.nonEmpty && files.forall(_.endsWith(ext)),
        s"$codec dir must hold only $ext files, got $files")
    }
  }

  test("q176 observed audit reconciles exactly with the report it rode along with") {
    import spark.implicits._
    val df = run("q176_observed_metrics")
    val rows = df.as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSet == Set("A", "N", "R"))
    // the audit columns came from observe() on the SAME pass — they must
    // reconcile exactly with the per-flag report they rode along with
    assert(rows.map(_._2).sum == rows.head._4, "audit n_rows reconciles")
    assert(rows.map(_._3).sum == rows.head._5, "audit total reconciles")
    assert(rows.head._6 <= rows.head._7)
  }

  test("q172 collation grouping partitions rows exactly like lower()") {
    import spark.implicits._
    val rows = run("q172_collation_group")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.map(_._2).sum == Tables(spark, dir, "part").count(),
      "case-insensitive groups cover every part exactly once")
    assert(rows.exists(_._4 >= 2),
      "at least one type arrives in both case variants and still merges")
    assert(rows.forall(r => r._1 == r._1.toLowerCase))
  }
}
