package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video payloads as opaque
 * BINARY columns with typed metadata, decoded/feature-extracted by a
 * batched per-partition kernel.
 *
 * The image path is a REAL codec: binary PGM (P5) — ASCII header
 * `P5\n<w> <h>\n<maxval>\n` followed by w*h raw gray bytes — decoded
 * by [[MultimodalCodec.decodePgm]] (header parse + pixel array +
 * pixel statistics) and resampled by a genuine nearest-neighbor
 * kernel on resize. Audio/video payloads stay behind the
 * clearly-marked GMM1 stub ([[MultimodalCodec.decodeStub]]): those
 * codecs need native libs this environment doesn't ship, and the stub
 * preserves the pipeline shape (schema, batching, partitioning) that
 * IS under test. Swapping in a real audio/video codec changes only
 * the stub body.
 */
object Multimodal {

  /** A media object: opaque payload + routing metadata. */
  case class MediaRow(doc_id: Long, kind: String, media: Array[Byte])

  /** Decoder output: parsed metadata, extracted feature vector, and
    * sample statistics over the decoded payload (real pixel stats for
    * PGM images; byte stats of the raw samples for the stub kinds).
    * Integer stats (`px_sum`, not a float mean) so downstream
    * comparisons are drift-free: mean = px_sum / n_payload_bytes. */
  case class DecodedMedia(
      doc_id: Long, kind: String, width: Int, height: Int,
      n_payload_bytes: Int, n_frames: Int,
      checksum: Long, feat: Array[Double],
      px_min: Int, px_max: Int, px_sum: Long)

  private val Magic = Array[Byte]('G', 'M', 'M', '1')
  private val DecodeBatchSize = 64

  private def putInt(buf: Array[Byte], off: Int, v: Int): Unit = {
    buf(off) = (v >> 24).toByte; buf(off + 1) = (v >> 16).toByte
    buf(off + 2) = (v >> 8).toByte; buf(off + 3) = v.toByte
  }

  /**
   * Deterministic media synthesis from the documents table — stands
   * in for reading a real binary column off parquet. Runs as a typed
   * map — one pass, no shuffle. Image rows are REAL PGMs (pixels =
   * the utf8 text bytes cycled to w*h); audio/video rows are GMM1
   * stub payloads (12-byte header {magic, width:int32be,
   * height:int32be} ++ utf8(text)).
   */
  def synthesize(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val w = 16 + payload.length % 64
        val h = 16 + (payload.length * 7) % 64
        val kind = Seq("image", "audio", "video")((id % 3).toInt)
        val media =
          if (kind == "image") {
            val header = s"P5\n$w $h\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
            val m = new Array[Byte](header.length + w * h)
            System.arraycopy(header, 0, m, 0, header.length)
            var i = 0
            while (i < w * h) { m(header.length + i) = payload(i % payload.length); i += 1 }
            m
          } else {
            val m = new Array[Byte](12 + payload.length)
            System.arraycopy(Magic, 0, m, 0, 4)
            putInt(m, 4, w)
            putInt(m, 8, h)
            System.arraycopy(payload, 0, m, 12, payload.length)
            m
          }
        MediaRow(id, kind, media)
      }
  }

  /**
   * Batched decode + feature extraction. mapPartitions with an
   * explicit batch grouping — the same shape a vectorized
   * (Arrow/mapInPandas) decoder needs, so partitioning and memory
   * behavior are honest: a partition never holds more than one batch
   * of decoded frames at a time. Dispatch is by container magic: P5
   * takes the real PGM codec, GMM1 the stub.
   */
  def decode(spark: SparkSession, media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(DecodeBatchSize).flatMap { batch =>
        batch.map { row =>
          if (MultimodalCodec.isPgm(row.media)) MultimodalCodec.decodePgm(row)
          else MultimodalCodec.decodeStub(row)
        }
      }
    }
  }

  /** One sampled frame of a media payload. */
  case class Frame(doc_id: Long, kind: String, frame_idx: Int,
                   n_bytes: Int, checksum: Long)

  /**
   * Resize stage. PGM images are REALLY resampled (nearest neighbor,
   * pure integer source-index math: `src_y = y*srcH/dstH`, `src_x =
   * x*srcW/dstW`) into a valid PGM at the new dimensions. GMM1 stub
   * payloads get their header dimensions rewritten (a real audio/video
   * transform would resample the payload; the pipeline shape — schema
   * in, schema out, no shuffle — is the real part).
   */
  def resize(spark: SparkSession, media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import spark.implicits._
    media.map { row =>
      if (MultimodalCodec.isPgm(row.media))
        row.copy(media = MultimodalCodec.resizePgm(row.media, w, h))
      else {
        val m = row.media.clone()
        putInt(m, 4, w)
        putInt(m, 8, h)
        row.copy(media = m)
      }
    }
  }

  /**
   * Frame sampling: split the payload (pixels for PGM, raw bytes
   * after the 12-byte header for GMM1) into fixed 256-byte frames and
   * keep every `every`-th one (a flatMap generator — one input row
   * fans out to its sampled frames, the mapInPandas-explode shape).
   * Only `video` rows are sampled; other kinds pass through as their
   * single frame 0.
   */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRow], every: Int): Dataset[Frame] = {
    import spark.implicits._
    val frameSize = 256
    media.flatMap { row =>
      val off = MultimodalCodec.payloadOffset(row.media)
      val payloadLen = row.media.length - off
      def frameChecksum(idx: Int): (Int, Long) = {
        val start = off + idx * frameSize
        val end = math.min(start + frameSize, row.media.length)
        var c = 0L
        var i = start
        while (i < end) { c = (c + (row.media(i) & 0xff)) % 1000000007L; i += 1 }
        (end - start, c)
      }
      if (row.kind != "video") {
        val (n, c) = frameChecksum(0)
        Seq(Frame(row.doc_id, row.kind, 0, math.min(n, payloadLen), c))
      } else {
        val nFrames = (payloadLen + frameSize - 1) / frameSize
        (0 until nFrames by every).map { f =>
          val (n, c) = frameChecksum(f)
          Frame(row.doc_id, row.kind, f, n, c)
        }
      }
    }
  }
}

object MultimodalCodec {

  /** Binary-PGM (P5) container check. */
  def isPgm(m: Array[Byte]): Boolean =
    m.length >= 2 && m(0) == 'P' && m(1) == '5'

  /** Parse a P5 header: returns (width, height, maxval, pixelOffset).
    * Accepts the standard format — magic then three whitespace-
    * separated decimal fields, one whitespace after maxval, then raw
    * pixels. (Comment lines aren't emitted by this pipeline and are
    * not accepted.) */
  def pgmHeader(m: Array[Byte]): (Int, Int, Int, Int) = {
    var i = 2
    def skipWs(): Unit = { while (i < m.length && Character.isWhitespace(m(i))) i += 1 }
    def int(): Int = {
      skipWs()
      var v = 0
      require(i < m.length && m(i) >= '0' && m(i) <= '9', "bad PGM header")
      while (i < m.length && m(i) >= '0' && m(i) <= '9') { v = v * 10 + (m(i) - '0'); i += 1 }
      v
    }
    val w = int(); val h = int(); val mx = int()
    require(i < m.length && Character.isWhitespace(m(i)), "bad PGM header terminator")
    i += 1 // exactly ONE whitespace byte separates maxval from pixels
    (w, h, mx, i)
  }

  /** Byte offset where a container's payload starts (pixels for P5,
    * raw samples after the 12-byte header for GMM1). */
  def payloadOffset(m: Array[Byte]): Int =
    if (isPgm(m)) pgmHeader(m)._4 else 12

  /**
   * REAL image decode: P5 header parse + pixel array. Features are a
   * 16-bin intensity histogram; statistics (min/max/sum) are over the
   * actual decoded pixels.
   */
  def decodePgm(row: Multimodal.MediaRow): Multimodal.DecodedMedia = {
    val m = row.media
    val (w, h, mx, off) = pgmHeader(m)
    require(mx == 255, s"unsupported PGM maxval $mx for doc ${row.doc_id}")
    require(m.length - off == w * h, s"truncated PGM for doc ${row.doc_id}")
    val hist = new Array[Double](16)
    var checksum = 0L
    var sum = 0L
    var mn = 255
    var mxv = 0
    var i = off
    while (i < m.length) {
      val b = m(i) & 0xff
      hist(b >> 4) += 1.0
      checksum = (checksum + b) % 1000000007L
      sum += b
      if (b < mn) mn = b
      if (b > mxv) mxv = b
      i += 1
    }
    Multimodal.DecodedMedia(row.doc_id, row.kind, w, h, w * h, 1, checksum, hist, mn, mxv, sum)
  }

  /** REAL nearest-neighbor PGM resample: integer source-index math
    * (`src_y = y*srcH/dstH`, `src_x = x*srcW/dstW`) so the transform
    * is exactly reproducible in any engine's integer arithmetic. */
  def resizePgm(m: Array[Byte], dstW: Int, dstH: Int): Array[Byte] = {
    val (sw, sh, _, off) = pgmHeader(m)
    val header = s"P5\n$dstW $dstH\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + dstW * dstH)
    System.arraycopy(header, 0, out, 0, header.length)
    var y = 0
    while (y < dstH) {
      val sy = y * sh / dstH
      var x = 0
      while (x < dstW) {
        out(header.length + y * dstW + x) = m(off + sy * sw + x * sw / dstW)
        x += 1
      }
      y += 1
    }
    out
  }

  /**
   * ===== STUB CODEC (audio/video only) =====
   * Deterministic stand-in for audio/video decoding (the real libs
   * are not in this container). Parses the GMM1 header, then
   * "extracts" a 16-bin byte histogram as the feature vector, a
   * polynomial checksum, and byte statistics of the raw samples. A
   * real implementation would JNI/FFI into a codec here; everything
   * outside this function stays unchanged.
   */
  def decodeStub(row: Multimodal.MediaRow): Multimodal.DecodedMedia = {
    val m = row.media
    require(m.length >= 12 && m(0) == 'G' && m(1) == 'M' && m(2) == 'M' && m(3) == '1',
      s"bad media header for doc ${row.doc_id}")
    val width = ((m(4) & 0xff) << 24) | ((m(5) & 0xff) << 16) | ((m(6) & 0xff) << 8) | (m(7) & 0xff)
    val height = ((m(8) & 0xff) << 24) | ((m(9) & 0xff) << 16) | ((m(10) & 0xff) << 8) | (m(11) & 0xff)
    val n = m.length - 12
    val hist = new Array[Double](16)
    var checksum = 0L
    var sum = 0L
    var mn = 255
    var mxv = 0
    var i = 12
    while (i < m.length) {
      val b = m(i) & 0xff
      hist(b >> 4) += 1.0
      checksum = (checksum + b) % 1000000007L
      sum += b
      if (b < mn) mn = b
      if (b > mxv) mxv = b
      i += 1
    }
    val frames = row.kind match {
      case "image" => 1
      case "audio" => 1 + n / 128 // fake: 1 frame per 128 "samples"
      case _       => 1 + n / 256 // fake: 1 frame per 256 bytes
    }
    Multimodal.DecodedMedia(row.doc_id, row.kind, width, height, n, frames,
      checksum, hist, mn, mxv, sum)
  }
}
