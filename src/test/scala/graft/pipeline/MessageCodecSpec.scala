package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Unit tier: job-message JSON codec round-trips + parse/validate split,
  * mirroring /root/reference/tests/test_message.py (round-trip :30-80,
  * missing-field ValueErrors :99-112, job_id defaulting message.py:94,
  * unknown-key tolerance message.py:93-97). ScalaCheck Gens drive the
  * round-trip across arbitrary hostnames/paths/ids (sampled directly —
  * the scalatest/scalacheck bridge artifact isn't on the offline
  * classpath).
  */
class MessageCodecSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val word: Gen[String] = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val pathGen: Gen[String] = Gen.listOfN(3, word).map(_.mkString("/", "/", ".bin"))
  private val jobGen: Gen[FileTransferJob] = for {
    id <- word; sh <- word; sp <- pathGen; dh <- word; dp <- pathGen
  } yield FileTransferJob(id, Endpoint(sh, sp), Endpoint(dh, dp))

  test("property: job JSON round-trips through parse (test_message.py round-trip)") {
    val jobs = (1 to 40).flatMap(i => jobGen.apply(Gen.Parameters.default, Seed(42L + i)))
    assert(jobs.length >= 30, "generator should produce samples")
    val json = jobs.toDS().select(to_json(struct(col("*"))).as("value"))
    val (parsedDf, dlq) = Pipeline.parse(json)
    val parsed = parsedDf.as[FileTransferJob].collect()
    assert(dlq.count() == 0)
    assert(parsed.toSet == jobs.toSet)
  }

  test("missing job_id is defaulted to a UUID (message.py:94)") {
    val raw = Seq("""{"source":{"hostname":"a","path":"/p"},"destination":{"hostname":"b","path":"/q"}}""")
      .toDF("value")
    val (jobs, dlq) = Pipeline.parse(raw)
    val job = jobs.as[FileTransferJob].head()
    assert(dlq.count() == 0)
    assert(job.job_id.matches("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"))
  }

  test("unknown extra keys are ignored (message.py:93-97)") {
    val raw = Seq("""{"job_id":"j1","source":{"hostname":"a","path":"/p"},
      "destination":{"hostname":"b","path":"/q"},"surprise":42}""".replace("\n", ""))
      .toDF("value")
    val (jobs, dlq) = Pipeline.parse(raw)
    assert(jobs.count() == 1 && dlq.count() == 0)
  }

  test("missing source/destination routes to DLQ with reference error (message.py:88-91)") {
    val raw = Seq(
      """{"job_id":"j1","destination":{"hostname":"b","path":"/q"}}""",
      """{"job_id":"j2","source":{"hostname":"a","path":"/p"}}""").toDF("value")
    val (jobs, dlq) = Pipeline.parse(raw)
    assert(jobs.count() == 0)
    val errs = dlq.select("error").as[String].collect().sorted
    assert(errs.sameElements(Array(
      "Missing required field: destination", "Missing required field: source")))
  }

  test("unparseable JSON routes to DLQ preserving raw text (consumer.py:198-209)") {
    val raw = Seq("not json at all {", "{\"half\":").toDF("value")
    val (jobs, dlq) = Pipeline.parse(raw)
    assert(jobs.count() == 0)
    val rows = dlq.select("error", "original_message", "error_type").collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getString(0).startsWith("Failed to parse message: "))
      assert(r.getString(1).contains("\"raw\":"))
      assert(r.getString(2) == "parse")
    }
  }

  test("DLQ records carry retry_count=0 and a timestamp (message.py:112-130)") {
    val raw = Seq("broken {{").toDF("value")
    val (_, parseFailures) = Pipeline.parse(raw)
    val dlq = Pipeline.dlqRecords(spark.emptyDataset[TransferResult], parseFailures)
    val row = dlq.select("retry_count", "timestamp").head()
    assert(row.getInt(0) == 0)
    assert(row.getTimestamp(1) != null)
  }
}
