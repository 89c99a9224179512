package graft.operators

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{FakeMediaDecoder, FrameSample, MediaMeta}

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
        graft.functions.Multimodal.decodeMeta(bin, () => new FakeMediaDecoder)
          .toDF().orderBy("doc_id")
      },
      Some("""
        SELECT doc_id,
               CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
               hex(CAST(substr(text, 1, 8) AS BLOB)) AS header_hex,
               CAST(16 * (1 + octet_length(CAST(text AS BLOB)) % 40) AS INT) AS width,
               CAST(16 * (1 + unicode(text[1]) % 30) AS INT) AS height,
               CAST(1 + octet_length(CAST(text AS BLOB)) % 7 AS INT) AS n_frames
        FROM documents
        ORDER BY doc_id""")),

    // ---------------------------------------------------------------- q43
    // Frame sampling: 4 evenly-spaced 16-byte frames per payload, each
    // fingerprinted; per-document distinct-frame stats. flatMap shape —
    // one payload expands to n frame rows, still a narrow pipeline.
    QueryDef(
      "q43_multimodal_framesample",
      (s, dir) => {
        import s.implicits._
        val bin = Tables(s, dir, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[(Long, Array[Byte])]
        val frames = bin.mapPartitions { it =>
          val dec = new FakeMediaDecoder
          it.flatMap { case (id, b) => dec.frameSample(id, b, 4) }
        }
        frames.toDF()
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_frames"),
            countDistinct("frame_fp").as("n_uniq_frames"),
            min(when(col("frame_idx") === 0, col("frame_fp"))).as("first_fp"),
            max("offset").as("last_offset"))
          .orderBy("doc_id")
      },
      Some("""
        WITH f AS (
          SELECT doc_id, i.range AS frame_idx,
                 CAST(i.range * (length(text) - 16) // 3 AS BIGINT) AS off
          FROM documents CROSS JOIN range(4) i
          WHERE length(text) >= 16),
        fp AS (
          SELECT doc_id, frame_idx, off,
                 list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                     list_transform(range(1, 17),
                       j -> CAST(unicode(substr(text, CAST(off AS INT) + CAST(j AS INT), 1)) AS BIGINT))),
                   (acc, c) -> (acc * 31 + c) % 1000000007) AS frame_fp
          FROM f JOIN documents USING (doc_id))
        SELECT doc_id,
               COUNT(*) AS n_frames,
               COUNT(DISTINCT frame_fp) AS n_uniq_frames,
               CAST(MIN(CASE WHEN frame_idx = 0 THEN frame_fp END) AS BIGINT) AS first_fp,
               CAST(MAX(off) AS BIGINT) AS last_offset
        FROM fp
        GROUP BY doc_id
        ORDER BY doc_id""")),

    // ---------------------------------------------------------------- q54
    // Resize stage (thumbnail fit-to-64): aspect-preserving integer
    // dimension fit plus a decimated-payload fingerprint, per-partition
    // through the same decoder seam (ImageIoDecoder does real pixel
    // scaling behind the identical signature — MultimodalSpec).
    QueryDef(
      "q54_multimodal_resize",
      (s, dir) => {
        import s.implicits._
        val bin = Tables(s, dir, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[(Long, Array[Byte])]
        val resized = bin.mapPartitions { it =>
          val dec = new FakeMediaDecoder
          it.map { case (id, b) => dec.resize(id, b, 64) }
        }
        resized.toDF().orderBy("doc_id")
      },
      Some("""
        WITH m AS (
          SELECT doc_id, text,
                 octet_length(CAST(text AS BLOB)) AS len,
                 16 * (1 + octet_length(CAST(text AS BLOB)) % 40) AS w,
                 16 * (1 + unicode(text[1]) % 30) AS h
          FROM documents)
        SELECT doc_id,
               CAST(w AS INT) AS in_w, CAST(h AS INT) AS in_h,
               CAST(GREATEST(1, w * 64 // GREATEST(w, h)) AS INT) AS out_w,
               CAST(GREATEST(1, h * 64 // GREATEST(w, h)) AS INT) AS out_h,
               list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(range(0, (LEAST(len, 64) - 1) // 4 + 1),
                     i -> CAST(unicode(text[CAST(1 + 4 * i AS INT)]) AS BIGINT))),
                 (acc, c) -> (acc * 31 + c) % 1000000007) AS out_fp
        FROM m
        ORDER BY doc_id"""))
  )
}
