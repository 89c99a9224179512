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

  /** Parsed read options — the ONE definition shared by the batch scan
    * and the streaming source, so the two paths cannot drift. */
  final case class ReadOptions(
      cfg: ServerConfig, dir: String, poolSize: Int,
      recursive: Boolean, threshold: Int, maxDepth: Int, nParts: Int)

  def readOptions(
      o: org.apache.spark.sql.util.CaseInsensitiveStringMap): ReadOptions = {
    val poolSize = Option(o.get("pool.size")).map(_.toInt).getOrElse(4)
    ReadOptions(
      cfg = FtpDataSource.serverConfig(o),
      dir = FtpDataSource.dir(o),
      poolSize = poolSize,
      recursive = Option(o.get("recursive")).forall(_.toBoolean),
      threshold = Option(o.get("listing.parallelThreshold"))
        .map(_.toInt).getOrElse(10000),
      // trees deeper than this are almost certainly a symlink cycle
      // (FTP gives no inode identity to detect one directly) — fail
      // loudly instead of walking forever; raiseable per scan
      maxDepth = Option(o.get("listing.maxDepth")).map(_.toInt).getOrElse(64),
      // default ONE partition per pooled connection: each reader holds
      // its connection for the whole chunk
      nParts = Option(o.get("numPartitions")).map(_.toInt).getOrElse(poolSize))
  }

  /** Which listed files a scan may read, in deterministic order:
    * in-progress temps from a concurrent/crashed writer are not data,
    * and pushed path predicates prune before planning. Shared by batch
    * planning and streaming micro-batch planning. */
  def planFiles(
      listed: Seq[Listed], keep: String => Boolean): Seq[(String, Long)] =
    listed
      .filterNot(f => f.path
        .substring(f.path.lastIndexOf('/') + 1).matches(""".*\.inprog-\d+$"""))
      .filter(f => keep(f.path))
      .sortBy(_.path)
      .map(f => (f.path, f.size))

  /** Round-robin chunking into InputPartitions — balanced, one held
    * pooled connection per partition. */
  def chunk(files: Seq[(String, Long)], ro: ReadOptions, columns: Seq[String])
      : Array[org.apache.spark.sql.connector.read.InputPartition] =
    files.zipWithIndex
      .groupBy(_._2 % math.max(1, math.min(ro.nParts, files.size)))
      .toSeq.sortBy(_._1)
      .map { case (_, ps) =>
        FtpFilesPartition(ro.cfg, ps.map(_._1), ro.poolSize, columns)
          : org.apache.spark.sql.connector.read.InputPartition }
      .toArray

  /** All files under `ro.dir`. Sub-directories are descended only when
    * `recursive`; once more than `threshold` files are known and
    * directories remain pending, the remaining subtrees are listed by a
    * distributed job instead of the driver's connection. The driver
    * walk holds ONE pooled connection for the entire pass (no
    * borrow/validate round-trip per directory). */
  def listFiles(ro: ReadOptions): Seq[Listed] = {
    val files = mutable.ArrayBuffer.empty[Listed]
    val pending = mutable.Queue(ro.dir -> 0)
    var handoff: Seq[(String, Int)] = Nil
    withConn(ro.cfg, ro.poolSize) { be =>
      while (pending.nonEmpty && handoff.isEmpty) {
        if (ro.recursive && files.size > ro.threshold) handoff = pending.toSeq
        else {
          val (dir, depth) = pending.dequeue()
          checkDepth(dir, depth, ro.maxDepth)
          val entries = be.listEntries(dir)
          files ++= entries.filterNot(_.isDir).map(e => Listed(join(dir, e.name), e.size))
          if (ro.recursive)
            pending ++= entries.filter(_.isDir).map(e => join(dir, e.name) -> (depth + 1))
        }
      }
    }
    if (handoff.nonEmpty) files.toSeq ++ listDistributed(ro, handoff)
    else files.toSeq
  }

  /** One task per chunk of directories; each task walks its whole
    * subtree sequentially over one pooled connection, resuming at the
    * depth the driver handed off (the cycle cap spans the whole walk).
    * Only (path, size) rows travel back — names are bytes, payloads
    * never move. */
  private def listDistributed(
      ro: ReadOptions, dirs: Seq[(String, Int)]): Seq[Listed] = {
    val sc = SparkSession.active.sparkContext
    val nTasks = math.max(1, math.min(dirs.size, sc.defaultParallelism))
    sc.parallelize(dirs, nTasks)
      .flatMap { d =>
        val out = mutable.ArrayBuffer.empty[Listed]
        withConn(ro.cfg, ro.poolSize) { be =>
          val stack = mutable.Stack(d)
          while (stack.nonEmpty) {
            val (cur, depth) = stack.pop()
            checkDepth(cur, depth, ro.maxDepth)
            distributedDirCount.incrementAndGet()
            val entries = be.listEntries(cur)
            out ++= entries.filterNot(_.isDir).map(e => Listed(join(cur, e.name), e.size))
            entries.filter(_.isDir).foreach(e => stack.push(join(cur, e.name) -> (depth + 1)))
          }
        }
        out
      }
      .collect().toSeq // bounded: the file index (DSv2 planning is driver-side)
  }

  private def checkDepth(dir: String, depth: Int, maxDepth: Int): Unit =
    if (depth > maxDepth)
      throw new IllegalStateException(
        s"FTP tree deeper than $maxDepth at $dir — symlink cycle? " +
          "(raise with option listing.maxDepth if the tree is real)")

  private def withConn[A](cfg: ServerConfig, poolSize: Int)(f: FtpBackend => A): A =
    FtpPools(cfg, PipelineConfig("FTP_POOL_SIZE" -> poolSize.toString))
      .withConnection(f)

  private def join(dir: String, name: String): String =
    if (dir.endsWith("/")) s"$dir$name" else s"$dir/$name"
}
