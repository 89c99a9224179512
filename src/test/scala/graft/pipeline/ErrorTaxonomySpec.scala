package graft.pipeline

import java.io.FileNotFoundException
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.pipeline.testkit.FakeFtpServer
import graft.pipeline.transfer.{FtpBackend, TransferFactory}

/** The error-taxonomy parity table (VERDICT r5 #8): one row per pinned
  * reference assertion — exception type, exact message shape, and DLQ
  * classification — so a refactor can't silently drift the DLQ payload
  * contract. Reference citations are /root/reference/src/etl paths.
  *
  * | # | reference                  | pinned shape                               |
  * |---|----------------------------|--------------------------------------------|
  * | 1 | message.py:88-89           | "Missing required field: source"           |
  * | 2 | message.py:90-91           | "Missing required field: destination"      |
  * | 3 | message.py:94              | missing job_id → generated UUID            |
  * | 4 | consumer.py:198-209        | {"raw": …} + "Failed to parse message: …"  |
  * | 5 | ftp.py:143-146             | RETR 550 → FileNotFound "Remote file not found: p" |
  * | 6 | ftp.py:167-168             | upload missing local → "Local file not found: p"   |
  * | 7 | local.py:64,87             | both directions → "Source file not found: p"       |
  * | 8 | base.py:100-105            | "Unsupported transfer type: T. Supported types: …" |
  * | 9 | config.py:106-108          | "Server type not found for hostname: h"    |
  * | 10| config.py:110-112          | "Host not found for hostname: h"           |
  * | 11| config.py:114-118          | "Invalid port for hostname h: p"           |
  * | 12| message.py:112-130         | DLQ record: retry_count=0, typed timestamp |
  */
@graft.tags.Integration
class ErrorTaxonomySpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def dlqOf(raw: String*) = {
    val (_, dlq) = Pipeline.parse(raw.toDF("value"))
    dlq.collect().map(r => (r.getAs[String]("original_message"),
      r.getAs[String]("error"), r.getAs[String]("error_type")))
  }

  test("rows 1-2: missing source/destination pin the reference ValueError text") {
    val Array((_, errS, typS)) =
      dlqOf("""{"destination":{"hostname":"d","path":"/p"}}""")
    assert(errS == "Missing required field: source" && typS == "parse")
    val Array((_, errD, typD)) =
      dlqOf("""{"source":{"hostname":"s","path":"/p"}}""")
    assert(errD == "Missing required field: destination" && typD == "parse")
  }

  test("row 3: a missing job_id is defaulted to a generated UUID (message.py:94)") {
    val (jobs, _) = Pipeline.parse(Seq(
      """{"source":{"hostname":"s","path":"/a"},"destination":{"hostname":"d","path":"/b"}}""")
      .toDF("value"))
    val id = jobs.collect().head.getAs[String]("job_id")
    assert(java.util.UUID.fromString(id) != null) // parses as a UUID
  }

  test("row 4: unparseable input wraps as {\"raw\": …} + parse-failure prefix") {
    val Array((orig, err, typ)) = dlqOf("not json at all")
    assert(orig.startsWith("""{"raw":"""), s"raw wrap drifted: $orig")
    assert(orig.contains("not json at all"))
    assert(err.startsWith("Failed to parse message: "), s"prefix drifted: $err")
    assert(typ == "parse")
  }

  test("rows 5-6: FTP backend 550 and missing-local errors (ftp.py:143-150,167-168)") {
    val root = Files.createTempDirectory("graft-taxonomy-ftp")
    val srv = new FakeFtpServer(root)
    try {
      val b = new FtpBackend(ServerConfig("t", "ftp", "127.0.0.1", srv.port, "u", "p"))
      b.connect()
      try {
        val e5 = intercept[FileNotFoundException](
          b.download("/ghost.bin", s"$root/out.bin"))
        assert(e5.getMessage == "Remote file not found: /ghost.bin")
        val e6 = intercept[FileNotFoundException](
          b.upload(s"$root/absent-local.bin", "/up.bin"))
        assert(e6.getMessage == s"Local file not found: $root/absent-local.bin")
      } finally b.disconnect()
    } finally srv.stop()
  }

  test("row 7: local backend says 'Source file not found' in BOTH directions (local.py:64,87)") {
    val b = TransferFactory.create(ServerConfig("l", "local", "localhost", 0, "", ""))
    val missing = s"${Files.createTempDirectory("graft-taxonomy-local")}/nope.txt"
    val eDown = intercept[FileNotFoundException](b.download(missing, "/tmp/x"))
    assert(eDown.getMessage == s"Source file not found: $missing")
    val eUp = intercept[FileNotFoundException](b.upload(missing, "/tmp/x"))
    assert(eUp.getMessage == s"Source file not found: $missing")
  }

  test("row 8: unknown transfer type lists supported types (base.py:100-105)") {
    val e = intercept[IllegalArgumentException](
      TransferFactory.create(ServerConfig("x", "sftp", "h", 22, "", "")))
    assert(e.getMessage == "Unsupported transfer type: sftp. Supported types: ftp, local")
  }

  test("rows 9-11: config lookup errors match config.py byte for byte") {
    val pc = PipelineConfig("X_TYPE" -> "ftp", "X_HOST" -> "h", "X_PORT" -> "nope")
    assert(intercept[NoSuchElementException](pc.serverConfig("ghost")).getMessage
      == "Server type not found for hostname: ghost")
    assert(intercept[NoSuchElementException](
      PipelineConfig("Y_TYPE" -> "ftp").serverConfig("y")).getMessage
      == "Host not found for hostname: y")
    assert(intercept[NoSuchElementException](pc.serverConfig("x")).getMessage
      == "Invalid port for hostname x: nope")
  }

  test("row 12: DLQ records carry retry_count=0 and a typed timestamp (message.py:112-130)") {
    val (results, dlq) = Pipeline.run(
      Seq("""{"source":{"hostname":"nowhere","path":"/a"},"destination":{"hostname":"nowhere","path":"/b"}}""")
        .toDF("value"),
      PipelineConfig())
    assert(results.collect().head.status == "dlq")
    val row = dlq.collect().head
    assert(row.getAs[Int]("retry_count") == 0) // stored, never incremented on entry
    assert(row.getAs[java.sql.Timestamp]("timestamp") != null)
    // the config-lookup failure classifies as 'config' and carries the
    // reference's message inside the DLQ error string
    assert(row.getAs[String]("error_type") == "config")
    assert(row.getAs[String]("error").contains("Server type not found for hostname: nowhere"))
  }
}
