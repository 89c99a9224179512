package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Small-file compaction — the housekeeping operator every long-running
  * 100 TB lake needs: streaming sinks and per-batch dynamic-partition
  * writes accrete thousands of KB-sized files whose per-file open/footer
  * cost eventually dominates scan time. Compaction rewrites a directory
  * into ceil(totalBytes / targetBytes) files in one round-robin shuffle.
  *
  * Scale notes: the listing is driver-side metadata (names + lengths,
  * never data); the rewrite is a single `repartition(n)` whose
  * round-robin exchange spreads rows evenly regardless of input skew; at
  * 100 TB you run it per-partition-directory so each compaction job's
  * shuffle stays bounded.
  */
object Compaction {

  /** Rewrite `inDir` (parquet) into `outDir` with files sized toward
    * `targetBytes`. Returns (nFilesIn, nFilesOut). */
  def compact(s: SparkSession, inDir: String, outDir: String,
      targetBytes: Long): (Int, Int) = {
    val conf = s.sparkContext.hadoopConfiguration
    val in = new Path(inDir)
    val fs = in.getFileSystem(conf)
    // RECURSIVE listing: partitioned directories keep their data files
    // in subdirectories — a top-level-only listing would size the job
    // from zero bytes and silently funnel everything into one file
    val it = fs.listFiles(in, true)
    val files = Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next())
      .filter(_.getPath.getName.endsWith(".parquet")).toSeq
    require(files.nonEmpty,
      s"compact: no parquet files under $inDir — nothing to size the rewrite from")
    val total = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    s.read.parquet(inDir)
      .repartition(nOut)
      .write.mode("overwrite").parquet(outDir)
    val outFiles = fs.listStatus(new Path(outDir))
      .count(_.getPath.getName.endsWith(".parquet"))
    (files.length, outFiles)
  }

  val all: Seq[QueryDef] = Seq(

    // ---------------------------------------------------------------- q62
    // Compaction contract: stage `events` as 64 deliberately-tiny files
    // (the streaming-sink accretion shape), compact toward 4 MB targets,
    // and emit the invariants — row count preserved, file count reduced —
    // plus an exact value checksum proving the rewrite moved every row
    // untouched. The oracle states the contract over the original table
    // (file counts are engine bookkeeping, not data, so only their
    // boolean invariants are output).
    QueryDef(
      "q62_small_file_compaction",
      (s, dir) => {
        val sf = Paths.get(dir).getFileName.toString
        val tmp = System.getProperty("java.io.tmpdir")
        val small = s"$tmp/graft_compact/$sf/small"
        val compacted = s"$tmp/graft_compact/$sf/compacted"
        if (!Files.exists(Paths.get(small, "_SUCCESS"))) {
          Tables(s, dir, "events").repartition(64)
            .write.mode("overwrite").parquet(small)
        }
        val (nIn, nOut) = compact(s, small, compacted, 4L * 1024 * 1024)
        val rowsIn = s.read.parquet(small).count()
        s.read.parquet(compacted)
          .agg(count(lit(1)).as("n_rows"),
            sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
          .withColumn("rows_preserved", col("n_rows") === lit(rowsIn))
          .withColumn("files_reduced", lit(nOut < nIn))
          .select("n_rows", "rows_preserved", "files_reduced", "sum_value")
      },
      Some("""
        SELECT COUNT(*) AS n_rows,
               TRUE AS rows_preserved,
               TRUE AS files_reduced,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM events"""))
  )
}
