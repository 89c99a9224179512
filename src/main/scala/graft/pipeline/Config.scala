package graft.pipeline

/** Server registry + pipeline settings, resolved from an env-style
  * `Map[String, String]`.
  *
  * Mirrors /root/reference/src/etl/config.py:
  *  - `{HOSTNAME}_{TYPE,HOST,PORT,USERNAME,PASSWORD}` convention with
  *    case-insensitive hostnames (config.py:92-130);
  *  - missing TYPE/HOST → error; invalid PORT → error (config.py:104-118);
  *  - DLQ topic naming `{topic}{suffix}` with default suffix `-dlq`
  *    (config.py:37,76-85);
  *  - FTP pool tuning defaults: size 4, max-wait 30 s, idle 300 s
  *    (config.py:41-44; idle timeout is stored but never enforced in the
  *    reference — we store it and likewise do not evict, noted in Pool);
  *  - boolean env parsing accepts true/1/yes/on (config.py:87-90).
  *
  * The registry is a tiny dimension (O(10) entries): on the Spark side it
  * travels as a broadcast-friendly immutable Map captured in the transfer
  * operator's closure — the broadcast-hash-join shape of SURVEY §2.3/J1.
  */
final case class ServerConfig(
    hostname: String,
    serverType: String, // "ftp" | "local"
    host: String,
    port: Int,
    username: String,
    password: String)

final class PipelineConfig(env: Map[String, String]) extends Serializable {

  private val upper: Map[String, String] = env.map { case (k, v) => k.toUpperCase -> v }

  private def get(key: String): Option[String] = upper.get(key.toUpperCase)

  /** config.py:87-90 */
  def bool(key: String, default: Boolean): Boolean =
    get(key).map(_.trim.toLowerCase).map(v => Set("true", "1", "yes", "on")(v)).getOrElse(default)

  def int(key: String, default: Int): Int = get(key).map(_.trim.toInt).getOrElse(default)
  def double(key: String, default: Double): Double = get(key).map(_.trim.toDouble).getOrElse(default)

  /** config.py:36 — FTP passive mode, global toggle, default true. */
  def ftpPassiveMode: Boolean = bool("FTP_PASSIVE_MODE", default = true)
  /** config.py:41-44 */
  def ftpPoolSize: Int = int("FTP_POOL_SIZE", 4)
  def ftpPoolMaxWaitSec: Double = double("FTP_POOL_MAX_WAIT", 30.0)
  def ftpPoolIdleTimeoutSec: Double = double("FTP_POOL_IDLE_TIMEOUT", 300.0)
  /** NOT in the reference (its idle timeout is stored, never enforced —
    * config.py:43-44, and default-off keeps that parity). Opting in
    * makes pools evict connections idle beyond FTP_POOL_IDLE_TIMEOUT —
    * what a long-lived deployment needs so idle executors don't pin
    * server connection slots between micro-batches. */
  def ftpPoolIdleEnforce: Boolean = bool("FTP_POOL_IDLE_ENFORCE", default = false)
  /** config.py:37,39 */
  def dlqTopicSuffix: String = get("DLQ_TOPIC_SUFFIX").getOrElse("-dlq")
  def dlqSendTimeoutSec: Int = int("DLQ_SEND_TIMEOUT", 10)

  /** config.py:76-85 — per-topic DLQ routing (SURVEY §2.7/E3). */
  def dlqTopic(topic: String): String = s"$topic$dlqTopicSuffix"

  /** config.py:92-130 — resolve one server's config; error messages match
    * the reference so DLQ payloads classify identically.
    */
  def serverConfig(hostname: String): ServerConfig = {
    val h = hostname.toUpperCase
    def prop(p: String): Option[String] = get(s"${h}_$p")
    // error strings are byte-identical to the reference's ValueErrors
    // (config.py:108,112,118) — pinned by ErrorTaxonomySpec so DLQ
    // payloads classify and read identically
    val serverType = prop("TYPE").map(_.trim.toLowerCase).getOrElse(
      throw new NoSuchElementException(s"Server type not found for hostname: $hostname"))
    val host = prop("HOST").map(_.trim).getOrElse(
      throw new NoSuchElementException(s"Host not found for hostname: $hostname"))
    // default "21" regardless of type (config.py:114) — local ignores it
    val port = prop("PORT").map(_.trim) match {
      case None => 21
      case Some(p) =>
        try p.toInt
        catch {
          case _: NumberFormatException =>
            throw new NoSuchElementException(s"Invalid port for hostname $hostname: $p")
        }
    }
    ServerConfig(
      hostname = hostname.toLowerCase,
      serverType = serverType,
      host = host,
      port = port,
      username = prop("USERNAME").orElse(prop("USER")).getOrElse(""),
      password = prop("PASSWORD").orElse(prop("PASS")).getOrElse(""))
  }

  /** Eagerly resolve every hostname that has a `_TYPE` binding — the
    * broadcastable registry dimension. */
  def allServers: Map[String, ServerConfig] =
    upper.keys.collect { case k if k.endsWith("_TYPE") => k.dropRight("_TYPE".length) }
      .map(h => h.toLowerCase -> serverConfig(h)).toMap
}

object PipelineConfig {
  def fromEnv(): PipelineConfig = new PipelineConfig(sys.env)
  def apply(pairs: (String, String)*): PipelineConfig = new PipelineConfig(pairs.toMap)
}
