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
@graft.tags.E2E
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

  test("pushed path prefix filter RETRs ONLY matching files") {
    val root2 = Files.createTempDirectory("graft-ftpsrc-pushdown")
    Files.createDirectories(root2.resolve("docs"))
    for (i <- 1 to 5) Files.write(root2.resolve(s"docs/doc_$i.bin"), s"payload$i".getBytes)
    Files.write(root2.resolve("docs/other.bin"), "not a doc".getBytes)
    val srv = new FakeFtpServer(root2)
    try {
      val df = spark.read.format("graft-ftp")
        .option("host", "127.0.0.1").option("port", srv.port.toString)
        .option("username", "u").option("password", "p")
        .load("/docs")
        .filter(col("path").startsWith("/docs/doc_1"))
      // the optimizer must hand StartsWith to the source, visible in explain
      assert(df.queryExecution.executedPlan.toString.contains("PushedFilters"),
        s"expected pushed filters in:\n${df.queryExecution.executedPlan}")
      val rows = df.select("path", "content")
        .collect().map(r => (r.getString(0), new String(r.getAs[Array[Byte]](1), "UTF-8")))
      assert(rows.toSeq == Seq(("/docs/doc_1.bin", "payload1")))
      assert(srv.commandCount("RETR") == 1,
        s"a pushed prefix filter must fetch ONLY matching files, " +
          s"got ${srv.commandCount("RETR")} RETRs for 1 match of 6 files")
    } finally { FtpPools.closeAll(); srv.stop() }
  }

  test("pushed suffix + equality filters also prune the fetch list") {
    val root2 = Files.createTempDirectory("graft-ftpsrc-pushdown2")
    Files.createDirectories(root2.resolve("mix"))
    Files.write(root2.resolve("mix/a.bin"), "abin".getBytes)
    Files.write(root2.resolve("mix/a.txt"), "atxt".getBytes)
    Files.write(root2.resolve("mix/b.txt"), "btxt".getBytes)
    val srv = new FakeFtpServer(root2)
    try {
      def read0 = spark.read.format("graft-ftp")
        .option("host", "127.0.0.1").option("port", srv.port.toString)
        .option("username", "u").option("password", "p")
        .load("/mix")
      val txt = read0.filter(col("path").endsWith(".txt"))
        .select("path").collect().map(_.getString(0)).sorted
      assert(txt.toSeq == Seq("/mix/a.txt", "/mix/b.txt"))
      val retrAfterSuffix = srv.commandCount("RETR")
      assert(retrAfterSuffix == 0, "path-only scans answer from NLST alone")
      val one = read0.filter(col("path") === "/mix/b.txt")
        .select("content").collect().map(r => new String(r.getAs[Array[Byte]](0), "UTF-8"))
      assert(one.toSeq == Seq("btxt"))
      assert(srv.commandCount("RETR") == 1,
        "equality pushdown must fetch exactly the named file")
      // a residual (non-path) filter still composes on top, un-pushed
      val long = read0.filter(col("path").endsWith(".txt") && col("length") > 3)
        .count()
      assert(long == 2)
    } finally { FtpPools.closeAll(); srv.stop() }
  }

  test("column-pruned (path,length) scan answers from the listing: zero RETR, zero SIZE") {
    val (retrBefore, sizeBefore) = (server.commandCount("RETR"), server.commandCount("SIZE"))
    val rows = read().load("/data")
      .select("path", "length")
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(rows.toSeq == Seq(("/data/a.bin", 5L), ("/data/b.bin", 12L)))
    assert(server.commandCount("RETR") == retrBefore,
      "length-only scan must not download payloads")
    assert(server.commandCount("SIZE") == sizeBefore,
      "lengths must come from the planning LIST — zero per-file round-trips")
  }

  test("path-only and count(*) scans open no data commands at all") {
    val (retr0, size0) = (server.commandCount("RETR"), server.commandCount("SIZE"))
    val paths = read().load("/data").select("path")
      .collect().map(_.getString(0)).sorted
    assert(paths.toSeq == Seq("/data/a.bin", "/data/b.bin"))
    assert(read().load("/data").count() == 2)
    assert(server.commandCount("RETR") == retr0 && server.commandCount("SIZE") == size0,
      "path/count scans must answer from the driver NLST alone")
  }

  test("partition count defaults to the pool size (one held connection per task)") {
    val df = read().option("pool.size", "2").load("/data")
    assert(df.rdd.getNumPartitions == 2,
      "more tasks than pooled connections would just queue on the pool")
    val dfExplicit = read().option("pool.size", "2").option("numPartitions", "1").load("/data")
    assert(dfExplicit.rdd.getNumPartitions == 1)
  }

  test("NLST returning full paths (real-server behavior) still resolves files") {
    val root2 = Files.createTempDirectory("graft-ftpsrc-fp")
    Files.createDirectories(root2.resolve("docs"))
    Files.write(root2.resolve("docs/x.bin"), "xray".getBytes)
    val fullPathServer = new FakeFtpServer(root2, nlstFullPaths = true)
    try {
      val rows = spark.read.format("graft-ftp")
        .option("host", "127.0.0.1").option("port", fullPathServer.port.toString)
        .option("username", "u").option("password", "p")
        .load("/docs")
        .select("path", "content")
        .collect().map(r => (r.getString(0), new String(r.getAs[Array[Byte]](1), "UTF-8")))
      assert(rows.toSeq == Seq(("/docs/x.bin", "xray")),
        "full-path NLST entries must not double the directory prefix")
    } finally {
      graft.pipeline.transfer.FtpPools.closeAll()
      fullPathServer.stop()
    }
  }

  test("write path uploads via temp names and renames on commit") {
    import spark.implicits._
    val rows = Seq(
      ("/out/w1.bin", "first payload"),
      ("/out/w2.bin", "second payload"),
      ("/out/sub/w3.bin", "nested payload"))
    val df = rows.toDF("path", "text")
      .select(col("path"), length(col("text")).cast("long").as("length"),
        col("text").cast("binary").as("content"))
    df.write.format("graft-ftp")
      .option("host", "127.0.0.1").option("port", server.port.toString)
      .option("username", "u").option("password", "p")
      .mode("append").save("/out")
    // final names visible with exact bytes; no .inprog temp files remain
    for ((p, text) <- rows)
      assert(new String(java.nio.file.Files.readAllBytes(
        root.resolve(p.stripPrefix("/"))), "UTF-8") == text)
    import scala.jdk.CollectionConverters._
    val leftovers = java.nio.file.Files.walk(root.resolve("out")).iterator().asScala
      .filter(f => f.getFileName.toString.contains(".inprog")).toSeq
    assert(leftovers.isEmpty, s"temp files not cleaned: $leftovers")
    assert(server.commandCount("RNTO") >= 3, "commit must rename temp uploads")
    // write → read round-trip through the same source
    val back = read().load("/out")
      .select("path", "content")
      .collect().map(r => (r.getString(0), new String(r.getAs[Array[Byte]](1), "UTF-8")))
      .toMap
    assert(back("/out/w1.bin") == "first payload" && back("/out/w2.bin") == "second payload")
  }

  test("rewriting the same paths converges (idempotent overwriting rename)") {
    import spark.implicits._
    def writeOnce(text: String): Unit =
      Seq(("/idem/a.bin", text)).toDF("path", "text")
        .select(col("path"), length(col("text")).cast("long").as("length"),
          col("text").cast("binary").as("content"))
        .write.format("graft-ftp")
        .option("host", "127.0.0.1").option("port", server.port.toString)
        .option("username", "u").option("password", "p")
        .mode("append").save("/idem")
    writeOnce("v1"); writeOnce("v2")
    assert(new String(java.nio.file.Files.readAllBytes(
      root.resolve("idem/a.bin")), "UTF-8") == "v2")
  }

  test("rewrites converge on servers whose RNTO refuses to overwrite") {
    // RFC 959 leaves RNTO-overwrite server-defined; the commit path must
    // DELE the target and retry when the server replies 550
    val root2 = Files.createTempDirectory("graft-ftpsrc-rnto")
    Files.createDirectories(root2.resolve("idem"))
    val refusing = new FakeFtpServer(root2, rntoRefusesOverwrite = true)
    try {
      import spark.implicits._
      def writeOnce(text: String): Unit =
        Seq(("/idem/a.bin", text)).toDF("path", "text")
          .select(col("path"), length(col("text")).cast("long").as("length"),
            col("text").cast("binary").as("content"))
          .write.format("graft-ftp")
          .option("host", "127.0.0.1").option("port", refusing.port.toString)
          .option("username", "u").option("password", "p")
          .mode("append").save("/idem")
      writeOnce("v1"); writeOnce("v2")
      assert(new String(Files.readAllBytes(root2.resolve("idem/a.bin")), "UTF-8") == "v2")
      assert(refusing.commandCount("DELE") >= 1,
        "the second write must clear the existing target before retrying RNTO")
    } finally { FtpPools.closeAll(); refusing.stop() }
  }

  test("a transient RNTO failure does NOT delete the committed target") {
    // the DELE+retry fallback is for the server's permanent 550
    // overwrite-refusal only — a flaky 450 must leave the previously
    // committed version intact and surface the failure
    val root2 = Files.createTempDirectory("graft-ftpsrc-transient")
    Files.createDirectories(root2.resolve("idem"))
    Files.write(root2.resolve("idem/a.bin"), "v1".getBytes)
    val flaky = new FakeFtpServer(root2, rntoTransientFailures = 1)
    try {
      import spark.implicits._
      intercept[Exception] {
        Seq(("/idem/a.bin", "v2")).toDF("path", "text")
          .select(col("path"), length(col("text")).cast("long").as("length"),
            col("text").cast("binary").as("content"))
          .write.format("graft-ftp")
          .option("host", "127.0.0.1").option("port", flaky.port.toString)
          .option("username", "u").option("password", "p")
          .mode("append").save("/idem")
      }
      assert(new String(Files.readAllBytes(root2.resolve("idem/a.bin")), "UTF-8") == "v1",
        "transient rename failure destroyed the committed file")
    } finally { FtpPools.closeAll(); flaky.stop() }
  }

  test("a 550 refusal with NO existing target rethrows without blind DELE+retry") {
    // 550 is also what permission-denied and bad-path look like; when the
    // target does not exist, overwrite-refusal is impossible, so the
    // commit must surface the typed refusal instead of deleting and
    // re-renaming on faith (old behavior: DELE + second RNTO)
    val root2 = Files.createTempDirectory("graft-ftpsrc-denied")
    Files.createDirectories(root2.resolve("idem"))
    val denied = new FakeFtpServer(root2, rntoDenied = true)
    try {
      import spark.implicits._
      val e = intercept[Exception] {
        Seq(("/idem/a.bin", "v1")).toDF("path", "text")
          .select(col("path"), length(col("text")).cast("long").as("length"),
            col("text").cast("binary").as("content"))
          .write.format("graft-ftp")
          .option("host", "127.0.0.1").option("port", denied.port.toString)
          .option("username", "u").option("password", "p")
          .mode("append").save("/idem")
      }
      def rootCause(t: Throwable): Throwable =
        if (t.getCause == null || t.getCause == t) t else rootCause(t.getCause)
      assert(rootCause(e).isInstanceOf[graft.pipeline.transfer.RenameRefusedException],
        s"expected the typed refusal to surface, got ${rootCause(e)}")
      assert(denied.commandCount("RNTO") == 1,
        "no retry without a confirmed existing target")
      assert(denied.commandCount("DELE") <= 1,
        "only abort's temp cleanup may DELE — never the absent target")
      assert(denied.commandCount("SIZE") + denied.commandCount("NLST") >= 1,
        "commit must probe target existence before deciding")
    } finally { FtpPools.closeAll(); denied.stop() }
  }

  test("length-only scan falls back to RETR when the server lacks LIST and SIZE") {
    // length must not silently become -1 on metadata-less servers —
    // results would then depend on the projection. noList forces the
    // NLST fallback (listing carries no sizes), noSize kills the
    // per-file probe, so the reader's last resort is a real RETR
    val root2 = Files.createTempDirectory("graft-ftpsrc-nosize")
    Files.createDirectories(root2.resolve("data"))
    Files.write(root2.resolve("data/a.bin"), "alpha".getBytes)
    val sizeless = new FakeFtpServer(root2, noSize = true, noList = true)
    try {
      val rows = spark.read.format("graft-ftp")
        .option("host", "127.0.0.1").option("port", sizeless.port.toString)
        .option("username", "u").option("password", "p")
        .load("/data").select("path", "length")
        .collect().map(r => (r.getString(0), r.getLong(1)))
      assert(rows.toSeq == Seq(("/data/a.bin", 5L)))
      assert(sizeless.commandCount("RETR") >= 1,
        "the real length must come from a RETR fallback")
    } finally { FtpPools.closeAll(); sizeless.stop() }
  }

  test("read listing ignores another writer's in-progress temp files") {
    Files.createDirectories(root.resolve("mixed"))
    Files.write(root.resolve("mixed/real.bin"), "real".getBytes)
    Files.write(root.resolve("mixed/real.bin.inprog-42"), "par".getBytes)
    val paths = read().load("/mixed").select("path").collect().map(_.getString(0))
    assert(paths.toSeq == Seq("/mixed/real.bin"),
      "*.inprog-* temps are uncommitted write intermediates, not data")
  }

  test("null path or content rows fail with a descriptive column error") {
    import spark.implicits._
    val df = Seq(("/nul/a.bin", Option("ok")), ("/nul/b.bin", Option.empty[String]))
      .toDF("path", "text")
      .select(col("path"), lit(2L).as("length"), col("text").cast("binary").as("content"))
    Files.createDirectories(root.resolve("nul"))
    val e = intercept[Exception] {
      df.write.format("graft-ftp")
        .option("host", "127.0.0.1").option("port", server.port.toString)
        .option("username", "u").option("password", "p")
        .mode("append").save("/nul")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("column 'content' is null")),
      s"error must name the offending column, got: ${msgs(e)}")
  }

  test("a failed task DELEs already-staged temps (no orphans for readers)") {
    import spark.implicits._
    // second row fails validation after the first row staged its temp;
    // abort must leave the directory temp-free
    Files.createDirectories(root.resolve("half"))
    val df = Seq(
      ("/half/ok.bin", Option("fine")),
      ("/half/bad.bin", Option.empty[String])).toDF("path", "text")
      .select(col("path"), lit(4L).as("length"),
        col("text").cast("binary").as("content"))
      .coalesce(1) // one task: both rows share a writer, in Seq order
    intercept[Exception] {
      df.write.format("graft-ftp")
        .option("host", "127.0.0.1").option("port", server.port.toString)
        .option("username", "u").option("password", "p")
        .mode("append").save("/half")
    }
    import scala.jdk.CollectionConverters._
    val leftovers = Files.list(root.resolve("half")).iterator().asScala
      .filter(_.getFileName.toString.contains(".inprog")).toSeq
    assert(leftovers.isEmpty, s"aborted task left temps: $leftovers")
  }

  // ---- recursive + distributed listing (VERDICT r5 #1) -----------------

  private def stageTree(prefix: String): Path = {
    val r = Files.createTempDirectory(prefix)
    Files.createDirectories(r.resolve("tree/sub1/deep"))
    Files.createDirectories(r.resolve("tree/sub2"))
    Files.write(r.resolve("tree/a.bin"), "aa".getBytes)
    Files.write(r.resolve("tree/sub1/b.bin"), "bbb".getBytes)
    Files.write(r.resolve("tree/sub1/deep/c.bin"), "cccc".getBytes)
    Files.write(r.resolve("tree/sub2/d.bin"), "d".getBytes)
    r
  }
  private val TreeRows = Seq(
    ("/tree/a.bin", 2L, "aa"),
    ("/tree/sub1/b.bin", 3L, "bbb"),
    ("/tree/sub1/deep/c.bin", 4L, "cccc"),
    ("/tree/sub2/d.bin", 1L, "d"))
  private def collectTree(srv: FakeFtpServer, extra: (String, String)*) = {
    val base = spark.read.format("graft-ftp")
      .option("host", "127.0.0.1").option("port", srv.port.toString)
      .option("username", "u").option("password", "p")
    extra.foldLeft(base)((r, kv) => r.option(kv._1, kv._2))
      .load("/tree")
      .select("path", "length", "content")
      .collect().map(r => (r.getString(0), r.getLong(1),
        new String(r.getAs[Array[Byte]](2), "UTF-8"))).sortBy(_._1).toSeq
  }

  test("recursively lists nested directories, LISTing each dir exactly once") {
    val root2 = stageTree("graft-ftpsrc-tree")
    val srv = new FakeFtpServer(root2)
    try {
      assert(collectTree(srv) == TreeRows)
      for (d <- Seq("/tree", "/tree/sub1", "/tree/sub1/deep", "/tree/sub2"))
        assert(srv.commandCount("LIST", d) == 1,
          s"$d must be LISTed exactly once, got ${srv.commandCount("LIST", d)}")
    } finally { FtpPools.closeAll(); srv.stop() }
  }

  test("recursive=false restricts the scan to the root directory") {
    val root2 = stageTree("graft-ftpsrc-flat")
    val srv = new FakeFtpServer(root2)
    try {
      assert(collectTree(srv, "recursive" -> "false") ==
        Seq(("/tree/a.bin", 2L, "aa")))
    } finally { FtpPools.closeAll(); srv.stop() }
  }

  test("past the file-count threshold, pending subtrees list via a distributed job") {
    val root2 = stageTree("graft-ftpsrc-dist")
    val srv = new FakeFtpServer(root2)
    try {
      val before = FtpListing.distributedDirCount.get
      // threshold 0: the root's own files already exceed it, so sub1/
      // sub2 (and sub1/deep, discovered in-task) must be listed by the
      // parallel job, not the driver connection
      assert(collectTree(srv, "listing.parallelThreshold" -> "0") == TreeRows)
      assert(FtpListing.distributedDirCount.get - before >= 3,
        "the distributed listing job must walk the pending subtrees")
      for (d <- Seq("/tree", "/tree/sub1", "/tree/sub1/deep", "/tree/sub2"))
        assert(srv.commandCount("LIST", d) == 1,
          s"$d listed ${srv.commandCount("LIST", d)} times — dirs must never be listed twice")
    } finally { FtpPools.closeAll(); srv.stop() }
  }

  test("symlinked files and dirs in LIST resolve via the CWD probe") {
    // unix LIST renders links as "name -> target"; the client must strip
    // the target, probe the link for dir-ness, and treat it accordingly
    val root2 = Files.createTempDirectory("graft-ftpsrc-link")
    Files.createDirectories(root2.resolve("tree/real"))
    Files.write(root2.resolve("tree/real/a.bin"), "aa".getBytes)
    Files.write(root2.resolve("tree/f.bin"), "ff".getBytes)
    Files.createSymbolicLink(root2.resolve("tree/flink.bin"), root2.resolve("tree/f.bin"))
    Files.createSymbolicLink(root2.resolve("tree/dlink"), root2.resolve("tree/real"))
    // a DANGLING link must be skipped, not listed as data — it would
    // 550 every RETR and poison the scan (and every streaming trigger)
    Files.createSymbolicLink(root2.resolve("tree/ghost.bin"), root2.resolve("tree/gone.bin"))
    val srv = new FakeFtpServer(root2)
    try {
      assert(collectTree(srv) == Seq(
        ("/tree/dlink/a.bin", 2L, "aa"), // recursed THROUGH the dir link
        ("/tree/f.bin", 2L, "ff"),
        ("/tree/flink.bin", 2L, "ff"),   // file link fetches target bytes
        ("/tree/real/a.bin", 2L, "aa")))
    } finally { FtpPools.closeAll(); srv.stop() }
  }

  test("servers without LIST recurse via the NLST + CWD-probe fallback") {
    val root2 = stageTree("graft-ftpsrc-nolist")
    val srv = new FakeFtpServer(root2, noList = true)
    try {
      assert(collectTree(srv) == TreeRows)
      assert(srv.commandCount("NLST") >= 4, "fallback must NLST each directory")
      assert(srv.commandCount("CWD") > 0, "fallback must CWD-probe entries for dir-ness")
    } finally { FtpPools.closeAll(); srv.stop() }
  }

  // ---- task-retry / speculation idempotence (VERDICT r5 #2) ------------
  // local[4] schedules with maxFailures=1, so a real in-Spark retry can't
  // be provoked; these tests drive the DataWriter protocol exactly as
  // Spark's WritingSparkTask does — write→(failure)→abort→close, then a
  // fresh writer with a new task id for the retry / speculative attempt.

  private def writerRow(path: String, text: String) = {
    val bytes = text.getBytes("UTF-8")
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString(path),
        bytes.length.toLong, bytes))
  }

  test("a task killed mid-STOR retries cleanly: no temp orphans, no dupes, exact bytes") {
    val root2 = Files.createTempDirectory("graft-ftpsrc-kill")
    Files.createDirectories(root2.resolve("out"))
    // the first STOR accepts 3 payload bytes, then the server drops both
    // the data and control connections — a mid-upload death
    val srv = new FakeFtpServer(root2, storKillAfterBytes = 3L, storKillCount = 1)
    val cfg = graft.pipeline.ServerConfig(
      "kill-test", "ftp", "127.0.0.1", srv.port, "u", "p")
    try {
      val factory = new FtpWriterFactory(cfg, 2, FtpDataSource.Schema)
      val payload = "full payload, much longer than the three accepted bytes"
      // attempt 1: the task dies mid-write
      val w1 = factory.createWriter(0, 101L)
      intercept[java.io.IOException](w1.write(writerRow("/out/f.bin", payload)))
      w1.abort(); w1.close()
      import scala.jdk.CollectionConverters._
      def entries() = Files.list(root2.resolve("out")).iterator().asScala
        .map(_.getFileName.toString).toSeq.sorted
      assert(entries().isEmpty,
        s"abort must clean the partial temp through a fresh connection, left: ${entries()}")
      // attempt 2: Spark re-runs the task under a new task id
      val w2 = factory.createWriter(0, 102L)
      w2.write(writerRow("/out/f.bin", payload))
      w2.commit(); w2.close()
      assert(entries() == Seq("f.bin"), s"retry must leave exactly the final file: ${entries()}")
      assert(new String(Files.readAllBytes(root2.resolve("out/f.bin")), "UTF-8") == payload)
    } finally { FtpPools.closeAll(); srv.stop() }
  }

  test("a speculative duplicate attempt's abort never touches the committed file") {
    val root2 = Files.createTempDirectory("graft-ftpsrc-spec")
    Files.createDirectories(root2.resolve("spec"))
    val srv = new FakeFtpServer(root2)
    val cfg = graft.pipeline.ServerConfig(
      "spec-test", "ftp", "127.0.0.1", srv.port, "u", "p")
    try {
      val factory = new FtpWriterFactory(cfg, 2, FtpDataSource.Schema)
      // two attempts of the SAME partition race (speculation); both stage
      // under task-unique temp names, so neither can clobber the other
      val w1 = factory.createWriter(0, 201L)
      val w2 = factory.createWriter(0, 202L)
      w1.write(writerRow("/spec/s.bin", "winner"))
      w2.write(writerRow("/spec/s.bin", "winner"))
      w1.commit(); w1.close() // the commit coordinator picks attempt 1
      w2.abort(); w2.close()  // Spark kills the speculative loser
      import scala.jdk.CollectionConverters._
      val entries = Files.list(root2.resolve("spec")).iterator().asScala
        .map(_.getFileName.toString).toSeq.sorted
      assert(entries == Seq("s.bin"),
        s"loser's abort must remove ONLY its own temp: $entries")
      assert(new String(Files.readAllBytes(root2.resolve("spec/s.bin")), "UTF-8") == "winner")
    } finally { FtpPools.closeAll(); srv.stop() }
  }

  // ---- streaming source (the reference's poll loop as DSv2) ------------

  test("streaming source drains existing files, then ONLY new files after restart") {
    import org.apache.spark.sql.streaming.Trigger
    val root2 = Files.createTempDirectory("graft-ftpsrc-stream")
    Files.createDirectories(root2.resolve("stream"))
    Files.write(root2.resolve("stream/a.bin"), "alpha".getBytes)
    Files.write(root2.resolve("stream/b.bin"), "bravo".getBytes)
    val srv = new FakeFtpServer(root2)
    val checkpoint = Files.createTempDirectory("graft-ftpsrc-stream-cp").toString
    try {
      def drain(): Seq[(String, String)] = {
        val collected = scala.collection.mutable.Buffer.empty[(String, String)]
        val q = spark.readStream.format("graft-ftp")
          .option("host", "127.0.0.1").option("port", srv.port.toString)
          .option("username", "u").option("password", "p")
          .load("/stream")
          .writeStream
          .option("checkpointLocation", checkpoint)
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            collected ++= b.select("path", "content").collect()
              .map(r => (r.getString(0), new String(r.getAs[Array[Byte]](1), "UTF-8")))
            ()
          }
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        collected.toSeq.sorted
      }
      assert(drain() == Seq(("/stream/a.bin", "alpha"), ("/stream/b.bin", "bravo")))
      // a new file lands; the checkpointed offset must admit ONLY it
      Files.write(root2.resolve("stream/c.bin"), "charlie".getBytes)
      assert(drain() == Seq(("/stream/c.bin", "charlie")),
        "restart must process exactly the files that appeared since the committed offset")
      // nothing new: an empty drain, not a re-read
      assert(drain() == Seq.empty)
    } finally { FtpPools.closeAll(); srv.stop() }
  }

  test("streaming offsets JSON round-trip, including quotes and backslashes") {
    val o = FtpOffset(Seq(("/a/b.bin", 5L), ("""/weird "name"\x.bin""", -1L)))
    assert(FtpOffset.fromJson(o.json()) == o)
    assert(FtpOffset.fromJson(FtpOffset(Nil).json()) == FtpOffset(Nil))
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
