package graft.functions

/** Multimodal column support: opaque binary payloads + typed metadata.
  *
  * The builder brief calls for image/audio/video columns treated as
  * opaque `binary` with decode / feature-extract / resize / frame-sample
  * stages. The real media codecs are NOT on this classpath, so the decode
  * kernel is a clearly-marked deterministic stub ([[FakeMediaDecoder]]),
  * while everything Spark-side is real and load-bearing: the binary
  * column schema, the partition-iterator batch shape (decode amortizes
  * per-partition setup exactly like a Pandas-UDF `mapInPandas` batch), and
  * the typed metadata row it emits.
  *
  * Swapping in a real decoder is a one-class change behind
  * [[MediaDecoder]]; nothing in the pipeline schema moves.
  */
final case class MediaMeta(
    doc_id: Long,
    byte_len: Long,
    header_hex: String,
    width: Int,
    height: Int,
    n_frames: Int)

/** One sampled "frame": its index, byte offset, and content fingerprint. */
final case class FrameSample(doc_id: Long, frame_idx: Int, offset: Long, frame_fp: Long)

/** Output of the resize stage: source + fitted dimensions and a content
  * fingerprint of the scaled result. */
final case class ResizedMedia(
    doc_id: Long, in_w: Int, in_h: Int, out_w: Int, out_h: Int, out_fp: Long)

/** Output of the audio feature-extraction stage: windowed energy
  * (mean-absolute-amplitude) contour statistics over a 16-bit PCM
  * interpretation of the payload. */
final case class FrameEnergy(doc_id: Long, frame_idx: Int, energy: Long)

final case class AudioFeature(
    doc_id: Long, n_samples: Long, n_windows: Long,
    peak_energy: Long, mean_energy: Long, n_silent: Long)

trait MediaDecoder extends Serializable {
  /** Decode one payload into its metadata. Real implementations wrap an
    * image/audio library; per-partition state (decoder contexts, native
    * handles) belongs in [[open]]/[[close]]. */
  def decode(id: Long, bytes: Array[Byte]): MediaMeta

  /** Sample `n` evenly-spaced fixed-width frames from the payload (the
    * video frame-sampling stage; a real implementation seeks keyframes). */
  def frameSample(id: Long, bytes: Array[Byte], n: Int): Seq[FrameSample]

  /** Resize to fit `maxDim` on the longer edge, preserving aspect ratio
    * (the thumbnail stage of an image-preprocessing pipeline). */
  def resize(id: Long, bytes: Array[Byte], maxDim: Int): ResizedMedia

  /** Windowed energy contour over the payload read as 16-bit
    * little-endian PCM mono — unlike the stubbed image fields this IS
    * the real signal math (it runs unchanged on actual PCM bytes):
    * consecutive `win`-sample windows, energy = sum of |amplitude|
    * (exact integers), silence = energy below `silentBelow`. Trailing
    * partial windows are dropped. */
  def audioEnergy(id: Long, bytes: Array[Byte], win: Int,
      silentBelow: Long): AudioFeature = {
    val n = bytes.length / 2
    val nw = n / win
    var peak = 0L; var total = 0L; var silent = 0L
    var w = 0
    while (w < nw) {
      var e = 0L; var i = 0
      while (i < win) {
        val k = (w * win + i) * 2
        var v = (bytes(k) & 0xFF) + ((bytes(k + 1) & 0xFF) << 8)
        if (v >= 32768) v -= 65536
        e += math.abs(v); i += 1
      }
      if (e > peak) peak = e
      if (e < silentBelow) silent += 1
      total += e; w += 1
    }
    AudioFeature(id, n.toLong, nw.toLong, peak,
      if (nw > 0) total / nw else 0L, silent)
  }

  /** Brightness/energy contour over `n` evenly-spaced 16-byte frames
    * (offsets as [[frameSample]]): energy = sum of unsigned bytes —
    * the per-frame signal a shot-boundary detector thresholds. Like
    * [[audioEnergy]] this is real signal math, unchanged on real
    * frame buffers; only the framing is the stub's. */
  def frameEnergy(id: Long, bytes: Array[Byte], n: Int): Seq[FrameEnergy] = {
    val w = 16
    if (bytes.length < w || n < 2) Seq.empty
    else (0 until n).map { i =>
      val off = (i.toLong * (bytes.length - w) / (n - 1)).toInt
      var e = 0L; var j = off
      while (j < off + w) { e += (bytes(j) & 0xff); j += 1 }
      FrameEnergy(id, i, e)
    }
  }

  def open(): Unit = ()
  def close(): Unit = ()
}

/** STUB decoder — deterministic arithmetic stand-in for the absent media
  * libraries. Field derivations are intentionally simple enough for the
  * DuckDB oracle to replicate (octet length, first-8-bytes header hex,
  * dimensions/frames from byte arithmetic).
  */
final class FakeMediaDecoder extends MediaDecoder {
  private val hexDigits = "0123456789ABCDEF"

  override def decode(id: Long, bytes: Array[Byte]): MediaMeta = {
    val header = bytes.take(8).map { b =>
      val v = b & 0xff
      s"${hexDigits(v >> 4)}${hexDigits(v & 0xf)}"
    }.mkString
    val first = if (bytes.isEmpty) 0 else bytes(0) & 0xff
    MediaMeta(
      doc_id = id,
      byte_len = bytes.length.toLong,
      header_hex = header,
      width = 16 * (1 + (bytes.length % 40)),
      height = 16 * (1 + (first % 30)),
      n_frames = 1 + bytes.length % 7)
  }

  /** Aspect-fit with integer arithmetic (floor division), fingerprint =
    * the 31-polynomial rolling hash over every 4th byte of the first 64
    * (a decimated "thumbnail" of the payload) — all oracle-replicable. */
  override def resize(id: Long, bytes: Array[Byte], maxDim: Int): ResizedMedia = {
    val m = decode(id, bytes)
    val longEdge = math.max(m.width, m.height)
    val outW = math.max(1, (m.width.toLong * maxDim / longEdge).toInt)
    val outH = math.max(1, (m.height.toLong * maxDim / longEdge).toInt)
    var fp = 0L
    var i = 0
    val n = math.min(bytes.length, 64)
    while (i < n) { fp = (fp * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 4 }
    ResizedMedia(id, m.width, m.height, outW, outH, fp)
  }

  /** Frames are 16-byte windows at offsets i·(len−16)/(n−1); the
    * fingerprint is the same 31-polynomial rolling hash mod 1e9+7 the
    * text-analysis operator uses — deterministic and oracle-replicable. */
  override def frameSample(id: Long, bytes: Array[Byte], n: Int): Seq[FrameSample] = {
    val w = 16
    if (bytes.length < w || n < 2) Seq.empty
    else (0 until n).map { i =>
      val off = i.toLong * (bytes.length - w) / (n - 1)
      var fp = 0L
      var j = off.toInt
      while (j < off.toInt + w) { fp = (fp * 31 + (bytes(j) & 0xff)) % 1000000007L; j += 1 }
      FrameSample(id, i, off, fp)
    }
  }
}

/** REAL decoder for the image formats the JVM ships built-in readers for
  * (PNG, BMP, GIF, JPEG via `javax.imageio` — zero added dependencies):
  * width/height come from an actual pixel decode, not byte arithmetic.
  * Oracle-gated queries stay on [[FakeMediaDecoder]] (DuckDB can't decode
  * images); this class proves the `MediaDecoder` seam takes a real codec
  * unchanged — see MultimodalSpec, which drives the same partition-batched
  * plumbing over genuine PNG/BMP bytes.
  */
final class ImageIoDecoder extends MediaDecoder {
  private val hexDigits = "0123456789ABCDEF"

  override def decode(id: Long, bytes: Array[Byte]): MediaMeta = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"doc $id: no javax.imageio reader for this payload")
    val header = bytes.take(8).map { b =>
      val v = b & 0xff
      s"${hexDigits(v >> 4)}${hexDigits(v & 0xf)}"
    }.mkString
    MediaMeta(
      doc_id = id,
      byte_len = bytes.length.toLong,
      header_hex = header,
      width = img.getWidth,
      height = img.getHeight,
      n_frames = 1) // still-image formats: exactly one frame
  }

  /** REAL aspect-fit resize: nearest-neighbor pixel scaling (chosen over
    * bilinear because it is exactly deterministic), fingerprinted over the
    * scaled pixel values row-major with the shared rolling hash. */
  override def resize(id: Long, bytes: Array[Byte], maxDim: Int): ResizedMedia = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"doc $id: no javax.imageio reader for this payload")
    val (w, h) = (img.getWidth, img.getHeight)
    val longEdge = math.max(w, h)
    val outW = math.max(1, (w.toLong * maxDim / longEdge).toInt)
    val outH = math.max(1, (h.toLong * maxDim / longEdge).toInt)
    var fp = 0L
    for (y <- 0 until outH; x <- 0 until outW) {
      val px = img.getRGB(x * w / outW, y * h / outH) & 0xffffff
      fp = (fp * 31 + px) % 1000000007L
    }
    ResizedMedia(id, w, h, outW, outH, fp)
  }

  /** A still image has one frame: offset 0, fingerprinted over the first
    * 16 bytes with the same rolling hash the stub uses (a video decoder
    * would emit one row per sampled keyframe here). */
  override def frameSample(id: Long, bytes: Array[Byte], n: Int): Seq[FrameSample] = {
    if (bytes.length < 16) Seq.empty
    else {
      var fp = 0L
      var j = 0
      while (j < 16) { fp = (fp * 31 + (bytes(j) & 0xff)) % 1000000007L; j += 1 }
      Seq(FrameSample(id, 0, 0L, fp))
    }
  }
}

object Multimodal {
  import org.apache.spark.sql.Dataset

  /** The partition-batched decode stage (the `mapInPandas` analogue):
    * one decoder per partition, open()/close() bracketed around the
    * iterator, narrow (no shuffle), payloads never touch the driver.
    * Shared by q35 (stub decoder, oracle-gated) and MultimodalSpec
    * (real `javax.imageio` decoder over genuine image bytes). */
  def decodeMeta(bin: Dataset[(Long, Array[Byte])],
      mkDecoder: () => MediaDecoder): Dataset[MediaMeta] = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.mapPartitions { it =>
      val dec = mkDecoder()
      dec.open()
      // iterator-wrapped so close() runs after the partition drains
      new Iterator[MediaMeta] {
        def hasNext: Boolean = { val h = it.hasNext; if (!h) dec.close(); h }
        def next(): MediaMeta = { val (id, b) = it.next(); dec.decode(id, b) }
      }
    }
  }

  /** Audio feature extraction with the same per-partition decoder
    * lifecycle as [[decodeMeta]] (open once per batch, close on drain —
    * the `mapInPandas` batch shape). */
  def audioFeatures(bin: Dataset[(Long, Array[Byte])],
      mkDecoder: () => MediaDecoder, win: Int,
      silentBelow: Long): Dataset[AudioFeature] = {
    val spark = bin.sparkSession
    import spark.implicits._
    bin.mapPartitions { it =>
      val dec = mkDecoder()
      dec.open()
      new Iterator[AudioFeature] {
        def hasNext: Boolean = { val h = it.hasNext; if (!h) dec.close(); h }
        def next(): AudioFeature =
          { val (id, b) = it.next(); dec.audioEnergy(id, b, win, silentBelow) }
      }
    }
  }
}
