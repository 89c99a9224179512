package graft.sources

import java.util.concurrent.atomic.AtomicInteger

import scala.collection.mutable

import org.apache.spark.sql.SparkSession

import graft.pipeline.{PipelineConfig, ServerConfig}
import graft.pipeline.transfer.{FtpBackend, FtpPools}

/** Remote-tree discovery for the graft-ftp source.
  *
  * Planning needs the file list, but the listing WORK must not be a
  * single driver-side O(files) pass at cluster scale: the reference
  * nests transfer directories (/root/reference/src/etl/transfer/
  * ftp.py:186-212, exercised by tests/test_ftp_integration.py:139-171),
  * and a 100-TB corpus behind FTP easily holds millions of names.
  * Mirroring Spark's own `InMemoryFileIndex.bulkListLeafFiles`: the
  * driver walks the tree breadth-first over one pooled connection until
  * `threshold` files have been discovered with directories still
  * pending; every pending directory then becomes a row in a distributed
  * listing job whose tasks walk their subtrees executor-side (through
  * the same per-executor pools) and ship back only (path, size) tuples —
  * the driver receives the aggregated names (unavoidable: DSv2 batch
  * planning happens on the driver) but never performs the per-directory
  * network round-trips itself.
  */
object FtpListing {

  /** One discovered remote file: full path + size from the listing
    * (-1 when the server's listing carried no size). */
  final case class Listed(path: String, size: Long)

  /** Local-mode test hook: directories listed INSIDE the distributed
    * job's tasks (under local[*] the task closures share this JVM, so a
    * spec can assert the parallel path actually ran). */
  private[sources] val distributedDirCount = new AtomicInteger(0)

  /** Trees deeper than this are almost certainly a symlink cycle
    * (FTP gives no inode identity to detect one directly) — fail loudly
    * instead of walking forever. */
  private val MaxDepth = 64

  /** All files under `rootDir`. Sub-directories are descended only when
    * `recursive`; once more than `threshold` files are known and
    * directories remain pending, the remaining subtrees are listed by a
    * distributed job instead of the driver's connection. The driver
    * walk holds ONE pooled connection for the entire pass (no
    * borrow/validate round-trip per directory). */
  def listFiles(
      cfg: ServerConfig,
      poolSize: Int,
      rootDir: String,
      recursive: Boolean,
      threshold: Int): Seq[Listed] = {
    val files = mutable.ArrayBuffer.empty[Listed]
    val pending = mutable.Queue(rootDir -> 0)
    var handoff: Seq[String] = Nil
    withConn(cfg, poolSize) { be =>
      while (pending.nonEmpty && handoff.isEmpty) {
        if (recursive && files.size > threshold) handoff = pending.map(_._1).toSeq
        else {
          val (dir, depth) = pending.dequeue()
          checkDepth(dir, depth)
          val entries = be.listEntries(dir)
          files ++= entries.filterNot(_.isDir).map(e => Listed(join(dir, e.name), e.size))
          if (recursive)
            pending ++= entries.filter(_.isDir).map(e => join(dir, e.name) -> (depth + 1))
        }
      }
    }
    if (handoff.nonEmpty) files.toSeq ++ listDistributed(cfg, poolSize, handoff)
    else files.toSeq
  }

  /** One task per chunk of directories; each task walks its whole
    * subtree sequentially over one pooled connection. Only (path, size)
    * rows travel back — names are bytes, payloads never move. */
  private def listDistributed(
      cfg: ServerConfig, poolSize: Int, dirs: Seq[String]): Seq[Listed] = {
    val sc = SparkSession.active.sparkContext
    val nTasks = math.max(1, math.min(dirs.size, sc.defaultParallelism))
    sc.parallelize(dirs, nTasks)
      .flatMap { d =>
        val out = mutable.ArrayBuffer.empty[Listed]
        withConn(cfg, poolSize) { be =>
          val stack = mutable.Stack(d -> 0)
          while (stack.nonEmpty) {
            val (cur, depth) = stack.pop()
            checkDepth(cur, depth)
            distributedDirCount.incrementAndGet()
            val entries = be.listEntries(cur)
            out ++= entries.filterNot(_.isDir).map(e => Listed(join(cur, e.name), e.size))
            entries.filter(_.isDir).foreach(e => stack.push(join(cur, e.name) -> (depth + 1)))
          }
        }
        out
      }
      .collect().toSeq
  }

  private def checkDepth(dir: String, depth: Int): Unit =
    if (depth > MaxDepth)
      throw new IllegalStateException(
        s"FTP tree deeper than $MaxDepth at $dir — symlink cycle?")

  private def withConn[A](cfg: ServerConfig, poolSize: Int)(f: FtpBackend => A): A =
    FtpPools(cfg, PipelineConfig("FTP_POOL_SIZE" -> poolSize.toString))
      .withConnection(f)

  private def join(dir: String, name: String): String =
    if (dir.endsWith("/")) s"$dir$name" else s"$dir/$name"
}
