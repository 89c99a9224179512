package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.pipeline.testkit.FakeFtpServer
import graft.pipeline.transfer.FtpPools

/** Integration tier: the graft-ftp DataSource V2 against the fake
  * server — schema, listing, executor-side content fetch, error cases. */
class FtpSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSpec.spark
  private var root: Path = _
  private var server: FakeFtpServer = _

  override def beforeAll(): Unit = {
    root = Files.createTempDirectory("graft-ftpsrc")
    Files.createDirectories(root.resolve("data"))
    Files.write(root.resolve("data/a.bin"), "alpha".getBytes)
    Files.write(root.resolve("data/b.bin"), "bravo-longer".getBytes)
    server = new FakeFtpServer(root)
  }
  override def afterAll(): Unit = {
    FtpPools.closeAll()
    server.stop()
    import scala.jdk.CollectionConverters._
    Files.walk(root).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
  }

  private def read() = spark.read.format("graft-ftp")
    .option("host", "127.0.0.1").option("port", server.port.toString)
    .option("username", "u").option("password", "p")

  test("reads (path, length, content) rows with exact bytes") {
    val rows = read().load("/data")
      .select("path", "length", "content")
      .collect().map(r => (r.getString(0), r.getLong(1),
        new String(r.getAs[Array[Byte]](2), "UTF-8"))).sortBy(_._1)
    assert(rows.toSeq == Seq(
      ("/data/a.bin", 5L, "alpha"),
      ("/data/b.bin", 12L, "bravo-longer")))
  }

  test("schema matches the binaryFile shape") {
    val sch = read().load("/data").schema
    assert(sch.fieldNames.toSeq == Seq("path", "length", "content"))
  }

  test("filters compose on top of the source") {
    val n = read().load("/data").filter(col("length") > 5).count()
    assert(n == 1)
  }

  test("missing directory fails with a clear error") {
    val e = intercept[Exception](read().load("/nope").collect())
    assert(e.getMessage.contains("Remote dir not found") ||
      Option(e.getCause).exists(_.getMessage.contains("Remote dir not found")))
  }

  test("missing host option is rejected at planning") {
    val e = intercept[Exception] {
      spark.read.format("graft-ftp").load("/data").collect()
    }
    assert(e.getMessage.contains("'host' option is required") ||
      Option(e.getCause).exists(_.getMessage.contains("'host' option is required")))
  }
}
