package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Unit tier (SURVEY §5): env-config parsing, mirroring
  * /root/reference/tests/test_config.py:30-63. */
class ConfigSpec extends AnyFunSuite {

  private val pc = PipelineConfig(
    "MYFTP_TYPE" -> "ftp", "MYFTP_HOST" -> "10.0.0.1", "MYFTP_PORT" -> "2121",
    "MYFTP_USERNAME" -> "alice", "MYFTP_PASSWORD" -> "secret",
    "STORE_TYPE" -> "local", "STORE_HOST" -> "localhost")

  test("resolves full ftp server config by hostname") {
    val c = pc.serverConfig("myftp")
    assert(c == ServerConfig("myftp", "ftp", "10.0.0.1", 2121, "alice", "secret"))
  }

  test("hostname lookup is case-insensitive (config.py:101)") {
    assert(pc.serverConfig("MyFtp").host == "10.0.0.1")
    assert(pc.serverConfig("MYFTP").host == "10.0.0.1")
  }

  test("ftp port defaults to 21 when unset") {
    val p = PipelineConfig("X_TYPE" -> "ftp", "X_HOST" -> "h")
    assert(p.serverConfig("x").port == 21)
  }

  test("unknown hostname raises with reference error text (config.py:106-108)") {
    val e = intercept[NoSuchElementException](pc.serverConfig("nope"))
    assert(e.getMessage == "Server type not found for hostname: nope")
  }

  test("missing host raises (config.py:110-112)") {
    val p = PipelineConfig("X_TYPE" -> "ftp")
    val e = intercept[NoSuchElementException](p.serverConfig("x"))
    assert(e.getMessage == "Host not found for hostname: x")
  }

  test("invalid port raises (config.py:114-118)") {
    val p = PipelineConfig("X_TYPE" -> "ftp", "X_HOST" -> "h", "X_PORT" -> "abc")
    val e = intercept[NoSuchElementException](p.serverConfig("x"))
    assert(e.getMessage == "Invalid port for hostname x: abc")
  }

  test("bool parsing accepts true/1/yes/on (config.py:87-90)") {
    for (v <- Seq("true", "1", "yes", "on", "TRUE", "Yes"))
      assert(PipelineConfig("F" -> v).bool("f", default = false), s"'$v' should be true")
    for (v <- Seq("false", "0", "no", "off", "junk"))
      assert(!PipelineConfig("F" -> v).bool("f", default = true), s"'$v' should be false")
    assert(PipelineConfig().bool("missing", default = true))
  }

  test("DLQ topic naming: {topic}{suffix}, default -dlq (config.py:76-85)") {
    assert(pc.dlqTopic("file-transfer-jobs") == "file-transfer-jobs-dlq")
    val custom = PipelineConfig("DLQ_TOPIC_SUFFIX" -> ".errors")
    assert(custom.dlqTopic("t") == "t.errors")
    val empty = PipelineConfig("DLQ_TOPIC_SUFFIX" -> "")
    assert(empty.dlqTopic("t") == "t") // empty suffix edge case (test_config.py:55-63)
  }

  test("pool defaults: size 4, max-wait 30s, idle 300s (config.py:41-44)") {
    val p = PipelineConfig()
    assert(p.ftpPoolSize == 4)
    assert(p.ftpPoolMaxWaitSec == 30.0)
    assert(p.ftpPoolIdleTimeoutSec == 300.0)
    assert(!p.ftpPoolIdleEnforce,
      "idle enforcement must default OFF — the reference stores the timeout, never evicts")
    assert(p.ftpPassiveMode) // config.py:36 default true
  }

  test("allServers returns the broadcastable registry") {
    val all = pc.allServers
    assert(all.keySet == Set("myftp", "store"))
    assert(all("store").serverType == "local")
  }
}
