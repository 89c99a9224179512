package graft.sources

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

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
    options: CaseInsensitiveStringMap,
    columns: Seq[String],
    keep: String => Boolean) extends MicroBatchStream {

  private val ro = FtpListing.readOptions(options)

  override def initialOffset(): Offset = FtpOffset(Nil)

  // offsets record the RAW listing (sorted for stable serialization):
  // the pushed predicate and the temp-name filter apply at PLANNING,
  // like FileStreamSource — so broadening a query filter across a
  // restart cannot misclassify months-old files as newly arrived
  override def latestOffset(): Offset =
    FtpOffset(FtpListing.listFiles(ro).sortBy(_.path).map(f => (f.path, f.size)))

  override def deserializeOffset(json: String): Offset = FtpOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[FtpOffset].files.map(_._1).toSet
    val fresh = end.asInstanceOf[FtpOffset].files.filterNot(f => seen(f._1))
    // same temp-filter/pushdown/order/chunking as the batch scan
    FtpListing.chunk(
      FtpListing.planFiles(
        fresh.map { case (p, s) => FtpListing.Listed(p, s) }, keep),
      ro, columns)
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

  /** STRICT parse: a truncated or hand-edited offset in the checkpoint
    * must fail loudly — a lenient parse would silently shrink the seen
    * set and re-ingest the whole landing zone as "new" files. The
    * serializer is canonical, so round-trip equality IS the validator. */
  def fromJson(json: String): FtpOffset = {
    val parsed = FtpOffset(Entry.findAllMatchIn(json).map { m =>
      (m.group(1).replace("\\\"", "\"").replace("\\\\", "\\"), m.group(2).toLong)
    }.toSeq)
    if (parsed.json() != json.trim)
      throw new IllegalStateException(
        s"corrupt graft-ftp offset in checkpoint (round-trip mismatch): $json")
    parsed
  }
}
