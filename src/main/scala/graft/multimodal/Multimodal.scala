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
