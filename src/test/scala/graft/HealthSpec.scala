package graft

import java.net.Socket
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Infrastructure health checks — the reference's
  * tests/test_health.py:1-48 semantics: required infrastructure must
  * FAIL these tests when absent, never skip, so a broken environment
  * reads as red instead of silently shrinking the suite. The
  * counterparts in this sandbox: the driver-generated parquet
  * fixtures (the corpus every query reads) and the in-process FTP
  * server (the transfer stack's infrastructure, which must bind and
  * answer a control connection). E2E-tagged: a health failure is a
  * full-stack failure, and the priority runner surfaces it first.
  */
@graft.tags.E2E
class HealthSpec extends AnyFunSuite {

  test("fixture tables are present at every gate scale") {
    // FAIL (not skip) on absence — tests/test_health.py:4 semantics
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    for (sf <- Seq("sf0.001", "sf0.01"); t <- tables) {
      val p = Paths.get(s"/root/testdata/$sf/$t.parquet")
      assert(Files.exists(p), s"missing fixture $p — testdata not staged")
    }
  }

  test("FTP infrastructure binds and answers a control connection") {
    val root = Files.createTempDirectory("graft-health-ftp")
    val server = new graft.pipeline.testkit.FakeFtpServer(root)
    try {
      val sock = new Socket("127.0.0.1", server.port)
      try {
        val line = new java.io.BufferedReader(
          new java.io.InputStreamReader(sock.getInputStream)).readLine()
        assert(line != null && line.startsWith("220"),
          s"FTP banner expected 220, got: $line")
      } finally sock.close()
    } finally {
      server.stop()
      Files.deleteIfExists(root)
    }
  }

  test("a Spark session starts and answers a query") {
    assert(SparkSpec.spark.range(10).count() == 10L,
      "local Spark session unavailable")
  }
}
