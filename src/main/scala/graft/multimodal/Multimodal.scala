package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed batch-wise with
  * `mapPartitions`.
  *
  * IMAGE decode is REAL: `javax.imageio` ships in the JDK (headless-safe,
  * no container libraries needed) and decodes PNG/JPEG/GIF/BMP — so image
  * feature extraction and resizing run on actual pixels. AUDIO decode is
  * REAL too: `javax.sound.sampled` (also in the JDK) parses WAV/AIFF/AU
  * containers and streams PCM samples, so audio features are computed
  * from actual waveforms. Only VIDEO decode remains STUBBED with a
  * deterministic digest-based fake (`StubCodec.decode`) — no video codec
  * ships in the JDK. Everything Spark-side is real and tested: the schema
  * contract, partition-batched execution, feature extraction signature,
  * and frame sampling shape.
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
      features: Array[Float],  // pixel/waveform-derived when decoded, digest-stub otherwise
      decoded: Boolean,        // true = features come from a REAL decode;
                               // false = stub fallback (video, or an image/
                               // audio payload no JDK reader accepts) —
                               // without this flag corrupt media would pass
                               // downstream as plausible-looking stats
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

  /** REAL video container header parsing — MP4/QuickTime box walking in
    * pure bytes (ISO BMFF: `[u32 size][4cc type]`, size 1 → u64
    * largesize): `moov/mvhd` carries timescale + duration, the first
    * `moov/trak/tkhd` carries 16.16-fixed width/height. No codec is
    * touched — this is the metadata pass a media lake runs before any
    * frame decode (which remains the one disclosed stub: the JDK ships
    * no video codec). Matroska/WebM (EBML) is not parsed. */
  object VideoHeader {
    private def u8(b: Array[Byte], i: Int): Long = (b(i) & 0xff).toLong
    private def be32(b: Array[Byte], i: Int): Long =
      (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
    private def be64(b: Array[Byte], i: Int): Long =
      (be32(b, i) << 32) | be32(b, i + 4)
    private def fourcc(b: Array[Byte], i: Int): String =
      new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** All boxes of type `typ` in [start, end), in order; each entry is
      * (payloadStart, payloadEnd). Corrupt sizes (2..7, inverted or
      * overrunning ranges, truncated largesize) abort the walk — a
      * stray fourcc inside payload bytes must never be re-scanned as a
      * box (the misalignment would fabricate duration/dims). */
    private def findBoxes(b: Array[Byte], start: Long, end: Long, typ: String): Seq[(Long, Long)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var off = start
      while (off + 8 <= end) {
        val size0 = be32(b, off.toInt)
        val (payload, boxEnd) =
          if (size0 == 1L) {
            if (off + 16 > end) return out.toSeq // truncated largesize
            (off + 16, off + be64(b, off.toInt + 8))
          }
          else if (size0 == 0L) (off + 8, end) // box extends to end
          else if (size0 < 8L) return out.toSeq // impossible size 2..7
          else (off + 8, off + size0)
        if (boxEnd < payload || boxEnd > end) return out.toSeq // corrupt size
        if (fourcc(b, off.toInt + 4) == typ) out += ((payload, boxEnd))
        off = boxEnd
      }
      out.toSeq
    }

    private def findBox(b: Array[Byte], start: Long, end: Long, typ: String): Option[(Long, Long)] =
      findBoxes(b, start, end, typ).headOption

    /** (durationMs, width, height) for an ISO-BMFF payload; durationMs
      * is -1 and width/height 0 when the respective headers are absent,
      * truncated, or carry no video dimensions (audio-only MP4 — the
      * FIRST trak with nonzero dims wins, so audio-before-video track
      * order still resolves). None when the payload is not MP4-family
      * (no leading ftyp box) or any box is corrupt enough to throw. */
    def parse(b: Array[Byte]): Option[(Long, Int, Int)] =
      try {
        if (b.length < 12 || fourcc(b, 4) != "ftyp") return None
        val end = b.length.toLong
        findBox(b, 0, end, "moov").map { case (moovStart, moovEnd) =>
          val durMs = findBox(b, moovStart, moovEnd, "mvhd").collect {
            // bounds-checked: v1 needs 32 payload bytes, v0 needs 20
            case (p, pe) if u8(b, p.toInt) == 1 && p + 32 <= pe =>
              (be32(b, p.toInt + 20), be64(b, p.toInt + 24))
            case (p, pe) if u8(b, p.toInt) == 0 && p + 20 <= pe =>
              (be32(b, p.toInt + 12), be32(b, p.toInt + 16))
          }.collect {
            case (timescale, duration) if timescale > 0 => duration * 1000L / timescale
          }.getOrElse(-1L)
          val dims = findBoxes(b, moovStart, moovEnd, "trak").iterator
            .flatMap { case (ts, te) =>
              findBox(b, ts, te, "tkhd").collect {
                case (tp, tpe) if {
                  val base = if (u8(b, tp.toInt) == 1) tp + 88 else tp + 76
                  base + 8 <= tpe
                } =>
                  val base = if (u8(b, tp.toInt) == 1) tp + 88 else tp + 76
                  // 16.16 fixed point; integer part only
                  ((be32(b, base.toInt) >> 16).toInt, (be32(b, base.toInt + 4) >> 16).toInt)
              }
            }
            .find { case (w, h) => w > 0 && h > 0 }
            .getOrElse((0, 0))
          (durMs, dims._1, dims._2)
        }
      } catch { case _: Exception => None }
  }

  /** Fill width/height/duration (and normalize mime) from the REAL
    * payload headers when the container is recognized — image dimensions
    * via [[ImageHeader]], audio duration/rate via [[AudioHeader]], video
    * duration/dimensions via [[VideoHeader]] (all header-only, no
    * sample/pixel/frame decode); declared metadata is kept as the
    * fallback. Pure map stage — the shape of a metadata-extraction
    * pass over a media lake. */
  def annotateDims(items: Dataset[MediaItem]): Dataset[MediaItem] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        ImageHeader.parse(m.payload) match {
          case Some((fmt, w, h)) =>
            m.copy(width = w, height = h, mime = s"image/$fmt")
          case None => AudioHeader.parse(m.payload) match {
            case Some((fmt, _, _, durMs)) =>
              m.copy(mime = s"audio/$fmt", duration_ms = durMs)
            case None => VideoHeader.parse(m.payload) match {
              case Some((durMs, w, h)) =>
                m.copy(mime = "video/mp4",
                  duration_ms = if (durMs >= 0) durMs else m.duration_ms,
                  width = if (w > 0) w else m.width,
                  height = if (h > 0) h else m.height)
              case None => m
            }
          }
        }
      }
    }
  }

  /** REAL image codec on `javax.imageio` (in the JDK; PNG/JPEG/GIF/BMP).
    * Headless-safe — ImageIO never touches a display. One codec object
    * per JVM; readers are created per call (ImageIO readers are not
    * thread-safe to share across tasks). */
  object ImageCodec {
    // belt-and-braces: never let AWT try to connect to a display on an
    // executor (ImageIO itself is headless, but downstream AWT calls
    // like Graphics2D respect this flag)
    System.setProperty("java.awt.headless", "true")

    /** Decode a payload to a BufferedImage; None when no ImageIO reader
      * recognizes the container (then callers fall back to the stub). */
    def decode(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      catch { case _: Exception => None }

    /** 8 pixel-derived features from a REAL decode:
      * [width, height, meanR, meanG, meanB, meanLuma, stddevLuma,
      * brightFrac] — channel means/stddev normalized to [0,1], brightFrac
      * = fraction of pixels above mean luma. Deterministic for lossless
      * formats (PNG/GIF/BMP); JPEG is deterministic per JDK decoder.
      * Per-row cost is two raster passes (means, then bright-fraction —
      * trading the second pass for not holding a per-pixel buffer). */
    def features(img: java.awt.image.BufferedImage): Array[Float] = {
      val w = img.getWidth
      val h = img.getHeight
      // long pixel count + two raster passes, NO per-pixel buffer: a
      // gigapixel image would overflow an Int w*h index and an 8-byte-
      // per-pixel luma array would OOM an executor long before that
      val n = (w.toLong * h).toDouble
      var sr, sg, sb, sl, sl2 = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          val l = 0.299 * r + 0.587 * g + 0.114 * b
          sr += r; sg += g; sb += b; sl += l; sl2 += l * l
          x += 1
        }
        y += 1
      }
      val meanL = sl / n
      val varL = math.max(0.0, sl2 / n - meanL * meanL)
      var bright = 0L
      y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val l = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
          if (l > meanL) bright += 1
          x += 1
        }
        y += 1
      }
      Array(w.toFloat, h.toFloat,
        (sr / n / 255.0).toFloat, (sg / n / 255.0).toFloat, (sb / n / 255.0).toFloat,
        (meanL / 255.0).toFloat, (math.sqrt(varL) / 255.0).toFloat,
        (bright / n).toFloat)
    }

    /** Re-encode a decoded image at (w, h) as PNG bytes (lossless, no
      * quality knob to vary across JVMs). Nearest-neighbor via
      * Graphics2D default interpolation — deterministic. */
    def resizePng(img: java.awt.image.BufferedImage, w: Int, h: Int): Array[Byte] = {
      val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try g.drawImage(img, 0, 0, w, h, null) finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
  }

  /** Header-only audio metadata — container type, sample rate, channels,
    * duration — via `AudioSystem.getAudioFileFormat`, which parses the
    * header WITHOUT reading sample data. The audio analog of
    * [[ImageHeader]]: the cheap metadata pass a media lake runs before
    * any full decode. */
  object AudioHeader {
    /** (format, sampleRate, channels, durationMs) when the payload is a
      * recognized audio container (WAV/AIFF/AU in a stock JDK); None
      * otherwise. durationMs is -1 when the header doesn't carry a frame
      * count. */
    def parse(b: Array[Byte]): Option[(String, Float, Int, Long)] =
      try {
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(b))
        val fmt = aff.getFormat
        val frames = aff.getFrameLength
        val durMs =
          if (frames > 0 && fmt.getFrameRate > 0) (frames * 1000.0 / fmt.getFrameRate).round
          else -1L
        Some((aff.getType.toString.toLowerCase, fmt.getSampleRate, fmt.getChannels, durMs))
      } catch { case _: Exception => None }
  }

  /** REAL audio codec on `javax.sound.sampled` (in the JDK; WAV/AIFF/AU
    * containers, PCM + µ-law/a-law encodings via the JDK's built-in
    * converters). Samples stream through a fixed-size buffer — a
    * multi-hour recording never materializes in memory. */
  object AudioCodec {

    /** Waveform statistics from one streaming pass. Amplitudes are
      * full-scale normalized to [-1, 1]; zeroCrossRate and dcOffset are
      * computed over channel 0 only (interleaved-channel crossings are
      * meaningless for stereo). */
    case class AudioStats(
        sampleRate: Float, channels: Int, bits: Int, durationMs: Long,
        rms: Double, peak: Double, zeroCrossRate: Double, dcOffset: Double)

    /** Decode a payload and stream its samples; None when no audio reader
      * recognizes the container (then callers fall back to the stub).
      * Non-PCM-16 encodings are converted by the JDK to signed 16-bit
      * little-endian at the source rate/channels before analysis. */
    def decode(payload: Array[Byte]): Option[AudioStats] =
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val src = ais.getFormat
          val target = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            src.getSampleRate, 16, src.getChannels, src.getChannels * 2,
            src.getSampleRate, false)
          val pcm =
            if (src.matches(target)) ais
            else javax.sound.sampled.AudioSystem.getAudioInputStream(target, ais)
          val ch = src.getChannels
          val buf = new Array[Byte](8192 - (8192 % (2 * ch))) // whole frames per read
          var n = 0L            // channel-0 samples seen
          var sum, sum2 = 0.0
          var peak = 0.0
          var crossings = 0L
          var prevSign = 0      // sign of previous channel-0 sample (0 = none yet)
          var read = pcm.read(buf)
          while (read > 0) {
            var i = 0
            while (i + 1 < read) {
              // little-endian int16; only channel 0 (first frame slot)
              val s = ((buf(i) & 0xff) | (buf(i + 1) << 8)).toShort / 32768.0
              sum += s; sum2 += s * s
              val a = math.abs(s); if (a > peak) peak = a
              val sign = if (s > 0) 1 else if (s < 0) -1 else prevSign
              if (prevSign != 0 && sign != 0 && sign != prevSign) crossings += 1
              if (sign != 0) prevSign = sign
              n += 1
              i += 2 * ch       // skip the other channels' slots
            }
            read = pcm.read(buf)
          }
          if (n == 0) None
          else {
            val durMs = (n * 1000.0 / src.getSampleRate).round
            Some(AudioStats(src.getSampleRate, ch, src.getSampleSizeInBits, durMs,
              rms = math.sqrt(sum2 / n), peak = peak,
              zeroCrossRate = if (n > 1) crossings.toDouble / (n - 1) else 0.0,
              dcOffset = sum / n))
          }
        } finally ais.close()
      } catch { case _: Exception => None }

    /** 8 waveform-derived features mirroring [[ImageCodec.features]]'s
      * shape: [sampleRate, channels, bitDepth, durationMs, rms, peak,
      * zeroCrossRate, dcOffset]. */
    def features(s: AudioStats): Array[Float] = Array(
      s.sampleRate, s.channels.toFloat, s.bits.toFloat, s.durationMs.toFloat,
      s.rms.toFloat, s.peak.toFloat, s.zeroCrossRate.toFloat, s.dcOffset.toFloat)
  }

  /** STUB codec — deterministic stand-in for VIDEO decoding only (images
    * and audio decode for real via [[ImageCodec]]/[[AudioCodec]]); also
    * the fallback for image/audio payloads no JDK reader recognizes. */
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
    * pattern a real decoder needs — init once, stream items through).
    * Images decode for REAL (javax.imageio → pixel statistics) and so
    * does audio (javax.sound → waveform statistics); payloads no JDK
    * reader accepts, and video kinds, use the stub. */
  def extractFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // per-partition init site (real impl: load codec/model here once)
      it.map { m =>
        val real = m.kind match {
          case "image" => Multimodal.ImageCodec.decode(m.payload).map(Multimodal.ImageCodec.features)
          case "audio" => Multimodal.AudioCodec.decode(m.payload).map(Multimodal.AudioCodec.features)
          case _ => None
        }
        MediaFeatures(m.media_id, m.kind, m.payload.length.toLong,
          Multimodal.StubCodec.digestHex(m.payload),
          real.getOrElse(Multimodal.StubCodec.decode(m.payload)),
          decoded = real.isDefined)
      }
    }
  }

  /** Distributed image resize: image payloads ImageIO can decode are
    * re-encoded as `w`×`h` PNG (metadata updated); everything else passes
    * through untouched. Pure map stage — no shuffle at any scale. */
  def resizeImages(items: Dataset[MediaItem], w: Int, h: Int): Dataset[MediaItem] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        if (m.kind != "image") m
        else Multimodal.ImageCodec.decode(m.payload) match {
          case Some(img) =>
            m.copy(payload = Multimodal.ImageCodec.resizePng(img, w, h),
              mime = "image/png", width = w, height = h)
          case None => m
        }
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
