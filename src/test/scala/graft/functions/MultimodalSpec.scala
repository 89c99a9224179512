package graft.functions

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The multimodal decode seam with a REAL codec: `ImageIoDecoder` decodes
  * genuine PNG/BMP bytes (JVM built-in readers, zero added deps) through
  * the SAME partition-batched plumbing the oracle-gated q35 runs with the
  * stub — proving a real decoder is a drop-in behind `MediaDecoder`.
  */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  /** Deterministic w×h test image encoded with the given imageio format. */
  private def imageBytes(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, format, out), s"no $format writer")
    out.toByteArray
  }

  test("ImageIoDecoder reads real PNG dimensions and magic bytes") {
    val bytes = imageBytes(20, 12, "png")
    val m = new ImageIoDecoder().decode(7L, bytes)
    assert(m.width == 20 && m.height == 12)
    assert(m.byte_len == bytes.length)
    assert(m.header_hex.startsWith("89504E470D0A1A0A"), "PNG magic")
    assert(m.n_frames == 1)
  }

  test("ImageIoDecoder reads BMP too (second built-in format)") {
    val m = new ImageIoDecoder().decode(8L, imageBytes(5, 9, "bmp"))
    assert(m.width == 5 && m.height == 9)
    assert(m.header_hex.startsWith("424D"), "BM magic")
  }

  test("real decoder drops into the partition-batched plumbing unchanged") {
    import spark.implicits._
    val payloads = Seq(
      (1L, imageBytes(20, 12, "png")),
      (2L, imageBytes(33, 7, "png")),
      (3L, imageBytes(5, 9, "bmp")))
    val bin = spark.createDataset(payloads).repartition(2)
    val rows = Multimodal.decodeMeta(bin, () => new ImageIoDecoder)
      .collect().map(m => m.doc_id -> (m.width, m.height)).toMap
    assert(rows == Map(1L -> ((20, 12)), 2L -> ((33, 7)), 3L -> ((5, 9))))
  }

  test("ImageIoDecoder resize does a real aspect-preserving pixel scale") {
    val dec = new ImageIoDecoder()
    val wide = dec.resize(1L, imageBytes(100, 40, "png"), 64)
    assert((wide.out_w, wide.out_h) == (64, 25), "100x40 fit to 64 → 64x25")
    assert((wide.in_w, wide.in_h) == (100, 40))
    val tall = dec.resize(2L, imageBytes(10, 80, "bmp"), 64)
    assert((tall.out_w, tall.out_h) == (8, 64), "10x80 fit to 64 → 8x64")
    // deterministic: same payload, same fingerprint
    val again = dec.resize(1L, imageBytes(100, 40, "png"), 64)
    assert(again.out_fp == wide.out_fp)
    // scaling actually changes the sampled pixels vs a different size
    val other = dec.resize(1L, imageBytes(100, 40, "png"), 32)
    assert(other.out_fp != wide.out_fp)
  }

  test("non-image payload fails loudly, naming the doc") {
    val e = intercept[IllegalArgumentException] {
      new ImageIoDecoder().decode(42L, "not an image".getBytes("UTF-8"))
    }
    assert(e.getMessage.contains("42"))
  }

  test("audioEnergy: closed form on constant PCM, sign fold, partial-window drop") {
    val dec = new FakeMediaDecoder
    // 32 samples of +1000 (LE 0xE8 0x03): two full 16-sample windows,
    // each energy = 16 * 1000
    val pos = Array.fill(32)(Array(0xE8.toByte, 0x03.toByte)).flatten
    val f = dec.audioEnergy(7L, pos, 16, 10000L)
    assert(f == graft.functions.AudioFeature(7L, 32, 2, 16000, 16000, 0))
    // -1000 (LE 0x18 0xFC) must fold through the signed branch to the
    // same |amplitude| energy
    val neg = Array.fill(32)(Array(0x18.toByte, 0xFC.toByte)).flatten
    assert(dec.audioEnergy(8L, neg, 16, 10000L).peak_energy == 16000)
    // 33rd sample starts a partial window: dropped, stats unchanged
    val partial = pos ++ Array(0xE8.toByte, 0x03.toByte)
    val p = dec.audioEnergy(9L, partial, 16, 10000L)
    assert(p.n_samples == 33 && p.n_windows == 2 && p.mean_energy == 16000)
    // silence threshold: zero samples count as silent windows
    val quiet = Array.fill(64)(0.toByte)
    assert(dec.audioEnergy(10L, quiet, 16, 10000L).n_silent == 2)
  }
}
