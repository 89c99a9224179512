package graft.pipeline.transfer

import java.io.FileNotFoundException
import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.pipeline.ServerConfig

/** Transfer backend contract + registry.
  *
  * Mirrors /root/reference/src/etl/transfer/base.py:
  *  - connect/disconnect bracketing with disconnect guaranteed on
  *    exception (base.py:21-70) — expressed here as `withConnection`;
  *  - download = remote→local, upload = local→remote (base.py:40-60);
  *  - the factory registry keyed by server type, case-insensitive, with
  *    an error listing supported types for unknown ones (base.py:73-108).
  */
trait TransferBackend extends AutoCloseable {
  def connect(): Unit
  def disconnect(): Unit
  override def close(): Unit = disconnect()

  /** Copy remote `remotePath` to local `localPath`; parent dirs created.
    * Missing source → FileNotFoundException; other failures → IOException. */
  def download(remotePath: String, localPath: String): Unit

  /** Copy local `localPath` to remote `remotePath`; remote parent dirs
    * created. Missing local source → FileNotFoundException. */
  def upload(localPath: String, remotePath: String): Unit
}

object TransferBackend {
  /** base.py:21-36 — context-manager semantics: disconnect always runs. */
  def withConnection[A](b: TransferBackend)(f: TransferBackend => A): A = {
    b.connect()
    try f(b)
    finally b.disconnect()
  }
}

/** Local-filesystem backend — /root/reference/src/etl/transfer/local.py.
  *
  * Both download and upload are "copy src→dst" (local.py:50-94; direction
  * is nominal). Copies preserve file attributes (`shutil.copy2` parity,
  * local.py:70,93) and create destination parent directories.
  */
final class LocalBackend extends TransferBackend {
  override def connect(): Unit = () // local.py:42-44 — no-op
  override def disconnect(): Unit = () // local.py:46-48 — no-op

  private def copy(src: String, dst: String, missingMsg: String): Unit = {
    val s = Paths.get(src)
    if (!Files.exists(s)) throw new FileNotFoundException(s"$missingMsg: $src")
    val d = Paths.get(dst)
    Option(d.getParent).foreach(Files.createDirectories(_))
    Files.copy(s, d, StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.COPY_ATTRIBUTES)
  }

  // local.py:50-71 / :73-94 — identical copy in both directions; BOTH
  // directions use "Source file not found" (local.py:64,87 — only the
  // FTP backend's upload says "Local file not found", ftp.py:168).
  override def download(remotePath: String, localPath: String): Unit =
    copy(remotePath, localPath, "Source file not found")
  override def upload(localPath: String, remotePath: String): Unit =
    copy(localPath, remotePath, "Source file not found")
}

/** base.py:73-108 — type→backend registry. Case-insensitive keys; unknown
  * type raises with the supported list (base.py:100-105). Kept extensible
  * (the reference plans s3/sftp: README.md:619-625).
  */
object TransferFactory {
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, ServerConfig => TransferBackend]()

  def register(serverType: String, make: ServerConfig => TransferBackend): Unit =
    registry.put(serverType.toLowerCase, make)

  def supportedTypes: Seq[String] = {
    import scala.jdk.CollectionConverters._
    registry.keySet.asScala.toSeq.sorted
  }

  def create(config: ServerConfig): TransferBackend = {
    val make = registry.get(config.serverType.toLowerCase)
    if (make == null)
      throw new IllegalArgumentException(
        s"Unsupported transfer type: ${config.serverType}. " +
          s"Supported types: ${supportedTypes.mkString(", ")}")
    make(config)
  }

  // Default registrations (ftp.py:216, local.py:108).
  register("local", _ => new LocalBackend)
  register("ftp", cfg => new FtpBackend(cfg))
}
