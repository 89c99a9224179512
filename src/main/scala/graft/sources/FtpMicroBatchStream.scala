package graft.sources

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.pipeline.ServerConfig

/** FTP directory as a Structured Streaming SOURCE — the reference's
  * poll loop (S2, /root/reference/src/etl/consumer.py:90-98) as a DSv2
  * `MicroBatchStream`: every trigger lists the tree ([[FtpListing]] —
  * recursive, threshold-parallel) and the files NEW since the last
  * committed offset become the micro-batch. Payloads are still fetched
  * executor-side through the connection pools ([[FtpReaderFactory]]);
  * column pruning and pushed path predicates apply to streaming scans
  * exactly as to batch ones.
  *
  * A listed file is assumed complete: the write path's temp-name +
  * rename-on-commit discipline (and the `*.inprog-*` listing filter)
  * guarantees readers never see partials, so append-only arrival is the
  * only contract a producer must keep.
  *
  * Offsets serialize the seen (path, size) set as JSON — right for
  * directory-scale landing zones; past ~1e5 files a production source
  * wants a compacted seen-files log like Spark's own FileStreamSource
  * (documented trade, not built).
  */
final class FtpMicroBatchStream(
    cfg: ServerConfig,
    options: CaseInsensitiveStringMap,
    columns: Seq[String],
    keep: String => Boolean) extends MicroBatchStream {

  private val dir = FtpDataSource.dir(options)
  private val poolSize = Option(options.get("pool.size")).map(_.toInt).getOrElse(4)
  private val recursive = Option(options.get("recursive")).forall(_.toBoolean)
  private val threshold = Option(options.get("listing.parallelThreshold"))
    .map(_.toInt).getOrElse(10000)
  private val nParts = Option(options.get("numPartitions")).map(_.toInt)
    .getOrElse(poolSize)

  override def initialOffset(): Offset = FtpOffset(Nil)

  override def latestOffset(): Offset = {
    val listed = FtpListing.listFiles(cfg, poolSize, dir, recursive, threshold)
      .filterNot(f => f.path
        .substring(f.path.lastIndexOf('/') + 1).matches(""".*\.inprog-\d+$"""))
      .filter(f => keep(f.path))
      .sortBy(_.path)
    FtpOffset(listed.map(f => (f.path, f.size)))
  }

  override def deserializeOffset(json: String): Offset = FtpOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[FtpOffset].files.map(_._1).toSet
    val fresh = end.asInstanceOf[FtpOffset].files.filterNot(f => seen(f._1))
    fresh.zipWithIndex.groupBy(_._2 % math.max(1, math.min(nParts, fresh.size)))
      .toSeq.sortBy(_._1)
      .map { case (_, ps) =>
        FtpFilesPartition(cfg, ps.map(_._1), poolSize, columns): InputPartition }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new FtpReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** The committed file set: (path, listedSize) pairs, JSON-serialized
  * into the checkpoint's offset log. */
final case class FtpOffset(files: Seq[(String, Long)]) extends Offset {
  override def json(): String =
    files.map { case (p, s) =>
      val esc = p.replace("\\", "\\\\").replace("\"", "\\\"")
      s"""["$esc",$s]"""
    }.mkString("[", ",", "]")
}

object FtpOffset {
  private val Entry = """\["((?:[^"\\]|\\.)*)",(-?\d+)\]""".r
  def fromJson(json: String): FtpOffset =
    FtpOffset(Entry.findAllMatchIn(json).map { m =>
      (m.group(1).replace("\\\"", "\"").replace("\\\\", "\\"), m.group(2).toLong)
    }.toSeq)
}
