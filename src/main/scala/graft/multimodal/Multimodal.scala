package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed batch-wise with
  * `mapPartitions`.
  *
  * The actual media decode (JPEG/PNG/audio codecs) is STUBBED — the
  * container has no media libraries — with a deterministic digest-based
  * fake (`StubCodec.decode`). Everything Spark-side is real and tested:
  * the schema contract, partition-batched execution, feature extraction
  * signature, and frame sampling shape. Swapping in a real codec is a
  * one-function change.
  */
object Multimodal {

  /** One media item: payload + typed metadata. */
  case class MediaItem(
      media_id: Long,
      kind: String,          // "image" | "audio" | "video"
      payload: Array[Byte],
      mime: String,
      width: Int,            // -1 when unknown / not applicable
      height: Int,
      duration_ms: Long,
  )

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      digest: String,
      features: Array[Float],  // decoded feature vector (stubbed)
  )

  case class Frame(media_id: Long, frame_idx: Int, offset_ms: Long, digest: String)

  /** REAL image-header parsing — PNG/JPEG/GIF/BMP dimensions straight from
    * payload bytes, no media libraries needed (these containers carry
    * their size in fixed header fields). This is the metadata-extraction
    * stage a 100 TB media pipeline runs *before* any full decode: cheap,
    * streaming, and enough for size filtering / bucketing / skew
    * planning. Only the pixel decode itself remains stubbed. */
  object ImageHeader {

    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
    private def le16(b: Array[Byte], i: Int): Int = (u8(b, i + 1) << 8) | u8(b, i)
    private def be32(b: Array[Byte], i: Int): Int =
      (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
    private def le32(b: Array[Byte], i: Int): Int =
      (u8(b, i + 3) << 24) | (u8(b, i + 2) << 16) | (u8(b, i + 1) << 8) | u8(b, i)

    /** (format, width, height) when the payload starts with a known image
      * container; None otherwise. */
    def parse(b: Array[Byte]): Option[(String, Int, Int)] = {
      if (b.length >= 24 &&
          u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
          b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
        // 8-byte signature, 4-byte length, "IHDR", then width/height BE32
        Some(("png", be32(b, 16), be32(b, 20)))
      } else if (b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8) {
        parseJpeg(b)
      } else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
          b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
        Some(("gif", le16(b, 6), le16(b, 8)))
      } else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
        Some(("bmp", le32(b, 18), le32(b, 22)))
      } else None
    }

    /** Walk JPEG markers to the first SOFn frame header (it carries the
      * dimensions: [marker][len][precision][height BE16][width BE16]). */
    private def parseJpeg(b: Array[Byte]): Option[(String, Int, Int)] = {
      var i = 2
      while (i + 3 < b.length && u8(b, i) == 0xff) {
        val code = u8(b, i + 1)
        if (code == 0xff) {
          i += 1 // 0xFF fill/padding byte: the next byte may itself be the marker
        } else if (code == 0xd8 || (code >= 0xd0 && code <= 0xd7) || code == 0x01) {
          i += 2 // standalone marker, no length field
        } else {
          val len = be16(b, i + 2)
          val isSof = code >= 0xc0 && code <= 0xcf &&
            code != 0xc4 && code != 0xc8 && code != 0xcc
          if (isSof) {
            return if (i + 8 < b.length) Some(("jpeg", be16(b, i + 7), be16(b, i + 5)))
                   else None
          }
          if (len < 2) return None
          i += 2 + len
        }
      }
      None
    }
  }

  /** Fill width/height (and normalize mime) from the REAL payload headers
    * when the container is recognized; declared metadata is kept as the
    * fallback. Pure map stage — the shape of a metadata-extraction pass
    * over a media lake. */
  def annotateDims(items: Dataset[MediaItem]): Dataset[MediaItem] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        ImageHeader.parse(m.payload) match {
          case Some((fmt, w, h)) =>
            m.copy(width = w, height = h, mime = s"image/$fmt")
          case None => m
        }
      }
    }
  }

  /** STUB codec — deterministic stand-in for image/audio decoding. */
  object StubCodec {
    private def md5(bytes: Array[Byte]): Array[Byte] =
      MessageDigest.getInstance("MD5").digest(bytes)

    def digestHex(bytes: Array[Byte]): String =
      md5(bytes).map("%02x".format(_)).mkString

    /** Fake "decode + embed": 8 floats derived from the payload digest.
      * Deterministic; replace with a real decoder + model at deploy time. */
    def decode(payload: Array[Byte]): Array[Float] = {
      val d = md5(payload)
      (0 until 8).map(i => ((d(i) & 0xff) - 128) / 128.0f).toArray
    }
  }

  /** Wrap raw payload rows into the MediaItem schema. */
  def fromBinary(df: DataFrame): Dataset[MediaItem] = {
    import df.sparkSession.implicits._
    df.select(
      col("media_id").cast("long"),
      col("kind").cast("string"),
      col("payload").cast("binary"),
      col("mime").cast("string"),
      coalesce(col("width"), lit(-1)).cast("int").as("width"),
      coalesce(col("height"), lit(-1)).cast("int").as("height"),
      coalesce(col("duration_ms"), lit(-1L)).cast("long").as("duration_ms"),
    ).as[MediaItem]
  }

  /** Batch feature extraction: one codec instance per partition (the
    * pattern a real decoder needs — init once, stream items through). */
  def extractFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // per-partition init site (real impl: load codec/model here once)
      it.map { m =>
        MediaFeatures(m.media_id, m.kind, m.payload.length.toLong,
          Multimodal.StubCodec.digestHex(m.payload), Multimodal.StubCodec.decode(m.payload))
      }
    }
  }

  /** Frame sampling for video-kind items: every `everyMs` up to `maxFrames`
    * frames; frames are digest-stubbed. Output explodes rows, so partition
    * sizing must account for the multiplier at scale. */
  def sampleFrames(items: Dataset[MediaItem], everyMs: Long, maxFrames: Int): Dataset[Frame] = {
    import items.sparkSession.implicits._
    items.filter(_.kind == "video").flatMap { m =>
      val n = math.min(maxFrames.toLong, math.max(0L, m.duration_ms / everyMs)).toInt
      (0 until n).map { i =>
        val off = i * everyMs
        val frameBytes = m.payload ++ BigInt(off).toByteArray
        Frame(m.media_id, i, off, Multimodal.StubCodec.digestHex(frameBytes))
      }
    }
  }

  /** Deterministic synthetic media table (for tests/demos: payload bytes
    * derived from the id — no external data needed). */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaItem] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kind = (i % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val payload = Array.tabulate[Byte](64 + (i % 64).toInt)(j => ((i * 31 + j) % 251).toByte)
      MediaItem(i, kind, payload, s"application/x-stub-$kind",
        if (kind == "image") 640 else -1, if (kind == "image") 480 else -1,
        if (kind == "video") 10000L + i * 100 else -1L)
    }
  }
}
