package graft.operators

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{FakeMediaDecoder, MediaMeta}

/** Multimodal operator surface: binary payload columns decoded to typed
  * metadata via a partition-batched decoder (see
  * [[graft.functions.Multimodal]] — decode kernel stubbed, plumbing real).
  *
  * 100 TB scale: decode is a narrow mapPartitions directly over the scan —
  * no shuffle; per-partition decoder open/close amortizes native-library
  * setup; binary payloads never serialize to the driver.
  */
object MultimodalQueries {

  val all: Seq[QueryDef] = Seq(

    // ---------------------------------------------------------------- q35
    // documents.text reinterpreted as an opaque binary payload column
    // (the fixture ships no real media bytes); decoded per-partition.
    QueryDef(
      "q35_multimodal_metadata",
      (s, dir) => {
        import s.implicits._
        val bin = Tables(s, dir, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[(Long, Array[Byte])]
        val decoded = bin.mapPartitions { it =>
          val dec = new FakeMediaDecoder
          dec.open()
          // iterator-wrapped so close() runs after the partition drains
          new Iterator[MediaMeta] {
            def hasNext: Boolean = { val h = it.hasNext; if (!h) dec.close(); h }
            def next(): MediaMeta = { val (id, b) = it.next(); dec.decode(id, b) }
          }
        }
        decoded.toDF().orderBy("doc_id")
      },
      Some("""
        SELECT doc_id,
               CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
               hex(CAST(substr(text, 1, 8) AS BLOB)) AS header_hex,
               CAST(16 * (1 + octet_length(CAST(text AS BLOB)) % 40) AS INT) AS width,
               CAST(16 * (1 + unicode(text[1]) % 30) AS INT) AS height,
               CAST(1 + octet_length(CAST(text AS BLOB)) % 7 AS INT) AS n_frames
        FROM documents
        ORDER BY doc_id"""))
  )
}
