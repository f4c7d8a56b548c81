package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video payloads as opaque
 * BINARY columns with typed metadata, decoded/feature-extracted by a
 * batched per-partition kernel.
 *
 * The Spark side is real and load-bearing — schema, typed Encoders,
 * partition-local batched iteration (the JVM analog of mapInPandas
 * batch shape), and the metadata/feature output contract. The codec
 * itself is a clearly-marked deterministic STUB (no image/audio libs
 * in this environment): payloads are synthesized with a 12-byte
 * GMM1 header + raw bytes, and "decode" parses the header and
 * computes a byte histogram as the stand-in feature vector. Swapping
 * in a real codec changes only the body of [[MultimodalCodec.decodeStub]].
 */
object Multimodal {

  /** A media object: opaque payload + routing metadata. */
  case class MediaRow(doc_id: Long, kind: String, media: Array[Byte])

  /** Decoder output: parsed metadata + extracted feature vector. */
  case class DecodedMedia(
      doc_id: Long, kind: String, width: Int, height: Int,
      n_payload_bytes: Int, n_frames: Int,
      checksum: Long, feat: Array[Double])

  private val Magic = Array[Byte]('G', 'M', 'M', '1')
  private val DecodeBatchSize = 64

  private def putInt(buf: Array[Byte], off: Int, v: Int): Unit = {
    buf(off) = (v >> 24).toByte; buf(off + 1) = (v >> 16).toByte
    buf(off + 2) = (v >> 8).toByte; buf(off + 3) = v.toByte
  }
  private def getInt(buf: Array[Byte], off: Int): Int =
    ((buf(off) & 0xff) << 24) | ((buf(off + 1) & 0xff) << 16) |
      ((buf(off + 2) & 0xff) << 8) | (buf(off + 3) & 0xff)

  /**
   * Deterministic media synthesis from the documents table (media =
   * GMM1 header{magic, width:int32be, height:int32be} ++ utf8(text)):
   * stands in for reading a real binary column off parquet. Runs as a
   * typed map — one pass, no shuffle.
   */
  def synthesize(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val media = new Array[Byte](12 + payload.length)
        System.arraycopy(Magic, 0, media, 0, 4)
        putInt(media, 4, 16 + payload.length % 64)
        putInt(media, 8, 16 + (payload.length * 7) % 64)
        System.arraycopy(payload, 0, media, 12, payload.length)
        MediaRow(id, Seq("image", "audio", "video")((id % 3).toInt), media)
      }
  }

  /**
   * Batched decode + feature extraction. mapPartitions with an
   * explicit batch grouping — the same shape a vectorized
   * (Arrow/mapInPandas) decoder needs, so partitioning and memory
   * behavior are honest: a partition never holds more than one batch
   * of decoded frames at a time.
   */
  def decode(spark: SparkSession, media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(DecodeBatchSize).flatMap { batch =>
        batch.map(MultimodalCodec.decodeStub)
      }
    }
  }

  /** One sampled frame of a media payload. */
  case class Frame(doc_id: Long, kind: String, frame_idx: Int,
                   n_bytes: Int, checksum: Long)

  /**
   * Resize stage (STUB codec: rewrites the header dimensions; a real
   * implementation would resample the payload). Typed map — the
   * pipeline shape (schema in, schema out, no shuffle) is the real part.
   */
  def resize(spark: SparkSession, media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import spark.implicits._
    media.map { row =>
      val m = row.media.clone()
      putInt(m, 4, w)
      putInt(m, 8, h)
      row.copy(media = m)
    }
  }

  /**
   * Frame sampling: split the payload into fixed 256-byte frames and
   * keep every `every`-th one (a flatMap generator — one input row
   * fans out to its sampled frames, the mapInPandas-explode shape).
   * Only `video` rows are sampled; other kinds pass through as their
   * single frame 0.
   */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRow], every: Int): Dataset[Frame] = {
    import spark.implicits._
    val frameSize = 256
    media.flatMap { row =>
      val payloadLen = row.media.length - 12
      def frameChecksum(idx: Int): (Int, Long) = {
        val start = 12 + idx * frameSize
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

  /**
   * ===== STUB CODEC =====
   * Deterministic stand-in for image/audio/video decoding (the real
   * libs are not in this container). Parses the GMM1 header, then
   * "extracts" a 16-bin byte histogram as the feature vector and a
   * polynomial checksum. A real implementation would JNI/FFI into a
   * codec here; everything outside this function stays unchanged.
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
    var i = 12
    while (i < m.length) {
      val b = m(i) & 0xff
      hist(b >> 4) += 1.0
      checksum = (checksum + b) % 1000000007L
      i += 1
    }
    val frames = row.kind match {
      case "image" => 1
      case "audio" => 1 + n / 128 // fake: 1 frame per 128 "samples"
      case _       => 1 + n / 256 // fake: 1 frame per 256 bytes
    }
    Multimodal.DecodedMedia(row.doc_id, row.kind, width, height, n, frames, checksum, hist)
  }
}
