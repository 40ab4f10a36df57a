package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {

  test("extractFeatures is deterministic and schema-complete") {
    val items = Multimodal.syntheticMedia(spark, 30)
    val feats = Multimodal.extractFeatures(items).collect()
    assert(feats.length == 30)
    assert(feats.forall(_.features.length == 8))
    // deterministic: same payload → same digest/features on a second run
    val again = Multimodal.extractFeatures(Multimodal.syntheticMedia(spark, 30)).collect()
    assert(feats.map(_.digest).sorted.sameElements(again.map(_.digest).sorted))
  }

  test("sampleFrames only samples video items and respects maxFrames") {
    val items = Multimodal.syntheticMedia(spark, 30)
    val frames = Multimodal.sampleFrames(items, everyMs = 1000, maxFrames = 5).collect()
    assert(frames.nonEmpty)
    assert(frames.groupBy(_.media_id).forall(_._2.length <= 5))
    val videoIds = items.filter(_.kind == "video").collect().map(_.media_id).toSet
    assert(frames.map(_.media_id).toSet.subsetOf(videoIds))
  }

  test("ImageHeader parses real PNG/JPEG/GIF/BMP dimension fields from bytes") {
    import Multimodal.ImageHeader
    // PNG: signature + IHDR length/type + width/height BE32
    val png = Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0x02, 0x80, /* width 640 */ 0, 0, 0x01, 0xe0 /* height 480 */,
      8, 6, 0, 0, 0).map(_.toByte)
    assert(ImageHeader.parse(png) == Some(("png", 640, 480)))

    // JPEG: SOI, APP0 (skipped via its length), SOF0 with height/width BE16
    val jpeg = Array[Int](0xff, 0xd8,
      0xff, 0xe0, 0x00, 0x04, 0x00, 0x00, // APP0, len 4 (2 payload bytes)
      0xff, 0xc0, 0x00, 0x0b, 0x08, 0x00, 0x64 /* h=100 */, 0x00, 0xc8 /* w=200 */,
      0x01, 0x01, 0x11, 0x00).map(_.toByte)
    assert(ImageHeader.parse(jpeg) == Some(("jpeg", 200, 100)))

    // GIF89a: width/height LE16
    val gif = Array[Int]('G', 'I', 'F', '8', '9', 'a', 0x20, 0x01 /* 288 */, 0x90, 0x00 /* 144 */).map(_.toByte)
    assert(ImageHeader.parse(gif) == Some(("gif", 288, 144)))

    // BMP: "BM", width/height LE32 at offsets 18/22
    val bmp = (Array[Int]('B', 'M') ++ Array.fill(16)(0) ++
      Array[Int](0x40, 0x01, 0, 0 /* 320 */, 0xf0, 0x00, 0, 0 /* 240 */) ++ Array.fill(2)(0)).map(_.toByte)
    assert(ImageHeader.parse(bmp) == Some(("bmp", 320, 240)))

    // unknown payloads stay unparsed
    assert(ImageHeader.parse(Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(ImageHeader.parse(Array.empty[Byte]).isEmpty)

    // 0xFF fill bytes between segments (legal JPEG padding) don't desync
    val padded = Array[Int](0xff, 0xd8,
      0xff, /* single fill byte */
      0xff, 0xc0, 0x00, 0x0b, 0x08, 0x00, 0x10, 0x00, 0x20,
      0x01, 0x01, 0x11, 0x00).map(_.toByte)
    assert(ImageHeader.parse(padded) == Some(("jpeg", 32, 16)))
  }

  test("annotateDims fills dimensions from payload headers, keeps fallback otherwise") {
    import spark.implicits._
    val png = Array[Int](0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0, 32, 0, 0, 0, 16, 8, 6, 0, 0, 0).map(_.toByte)
    val items = Seq(
      Multimodal.MediaItem(1L, "image", png, "application/octet-stream", -1, -1, -1L),
      Multimodal.MediaItem(2L, "audio", Array[Byte](9, 9, 9), "audio/wav", -1, -1, 1234L),
    ).toDS()
    val out = Multimodal.annotateDims(items).collect().map(m => m.media_id -> m).toMap
    assert(out(1L).width == 32 && out(1L).height == 16 && out(1L).mime == "image/png")
    assert(out(2L).width == -1 && out(2L).mime == "audio/wav") // untouched fallback
  }

  test("real PNG decode: pixel-derived features via javax.imageio, stub only for non-images") {
    import spark.implicits._
    // generate a REAL 4x2 PNG: left half pure red, right half pure blue
    val img = new java.awt.image.BufferedImage(4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4)
      img.setRGB(x, y, if (x < 2) 0xff0000 else 0x0000ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray

    val items = Seq(
      Multimodal.MediaItem(1L, "image", png, "image/png", -1, -1, -1L),
      Multimodal.MediaItem(2L, "audio", Array[Byte](1, 2, 3), "audio/wav", -1, -1, 99L),
    ).toDS()
    val out = Multimodal.extractFeatures(items).collect().map(f => f.media_id -> f).toMap

    // image features come from ACTUAL pixels: [w, h, meanR, meanG, meanB, ...]
    val f = out(1L).features
    assert(f(0) == 4.0f && f(1) == 2.0f)
    assert(math.abs(f(2) - 0.5) < 1e-6)   // mean R: half the pixels full red
    assert(f(3) == 0.0f)                  // no green anywhere
    assert(math.abs(f(4) - 0.5) < 1e-6)   // mean B: half the pixels full blue
    // real decode is flagged; audio stays on the disclosed stub
    assert(out(1L).decoded)
    assert(!out(2L).decoded)
    assert(out(2L).features.length == 8 && out(2L).features.sameElements(
      Multimodal.StubCodec.decode(Array[Byte](1, 2, 3))))
  }

  /** A REAL in-memory WAV: `nSamples` of a `hz` sine at `sr`, mono
    * 16-bit PCM little-endian, peak amplitude `amp`. */
  private def sineWav(sr: Float, hz: Double, nSamples: Int, amp: Double): Array[Byte] = {
    val bytes = new Array[Byte](nSamples * 2)
    for (i <- 0 until nSamples) {
      val s = (amp * math.sin(2 * math.Pi * hz * i / sr) * 32767).round.toShort
      bytes(2 * i) = (s & 0xff).toByte
      bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(sr, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real WAV decode: waveform statistics via javax.sound match the generated sine") {
    // 440 Hz sine, 0.5 s at 8 kHz, peak 0.5
    val wav = sineWav(sr = 8000f, hz = 440.0, nSamples = 4000, amp = 0.5)

    val s = Multimodal.AudioCodec.decode(wav).get
    assert(s.sampleRate == 8000f && s.channels == 1 && s.bits == 16)
    assert(s.durationMs == 500L)
    assert(math.abs(s.peak - 0.5) < 0.01)
    assert(math.abs(s.rms - 0.5 / math.sqrt(2)) < 0.01)  // sine RMS = peak/√2
    assert(math.abs(s.zeroCrossRate - 2 * 440.0 / 8000) < 0.01) // 880 crossings/s
    assert(math.abs(s.dcOffset) < 0.001)

    // header-only pass agrees without touching samples
    val hdr = Multimodal.AudioHeader.parse(wav)
    assert(hdr == Some(("wave", 8000f, 1, 500L)))

    // non-audio bytes stay unparsed
    assert(Multimodal.AudioCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.AudioHeader.parse(Array.empty[Byte]).isEmpty)
  }

  test("extractFeatures decodes real audio payloads; annotateDims fills audio duration") {
    import spark.implicits._
    val wav = sineWav(sr = 16000f, hz = 1000.0, nSamples = 8000, amp = 0.25)
    val items = Seq(
      Multimodal.MediaItem(1L, "audio", wav, "application/octet-stream", -1, -1, -1L),
      Multimodal.MediaItem(2L, "audio", Array[Byte](1, 2, 3), "audio/wav", -1, -1, 99L),
    ).toDS()

    val out = Multimodal.extractFeatures(items).collect().map(f => f.media_id -> f).toMap
    val f = out(1L).features
    assert(out(1L).decoded)
    assert(f(0) == 16000f && f(1) == 1f && f(2) == 16f && f(3) == 500f)
    assert(math.abs(f(4) - 0.25 / math.sqrt(2)) < 0.01)
    // undecodable audio payload stays on the disclosed stub, flagged
    assert(!out(2L).decoded)

    val dims = Multimodal.annotateDims(items).collect().map(m => m.media_id -> m).toMap
    assert(dims(1L).mime == "audio/wave" && dims(1L).duration_ms == 500L)
    assert(dims(2L).duration_ms == 99L) // unparsed: declared metadata kept
  }

  test("resizeImages re-encodes decodable images at the target size, passes others through") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, 0x00ff00)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val items = Seq(
      Multimodal.MediaItem(1L, "image", bos.toByteArray, "image/png", 8, 8, -1L),
      Multimodal.MediaItem(2L, "video", Array[Byte](7), "video/mp4", -1, -1, 500L),
    ).toDS()
    val out = Multimodal.resizeImages(items, 2, 2).collect().map(m => m.media_id -> m).toMap
    assert(out(1L).width == 2 && out(1L).height == 2)
    // the resized payload is a REAL decodable PNG at the new size, still green
    val back = Multimodal.ImageCodec.decode(out(1L).payload).get
    assert(back.getWidth == 2 && back.getHeight == 2)
    assert((back.getRGB(0, 0) & 0xffffff) == 0x00ff00)
    // non-image rows untouched
    assert(out(2L).payload.sameElements(Array[Byte](7)) && out(2L).width == -1)
  }

  test("queries() plumbing: features join back to items by id") {
    val items = Multimodal.syntheticMedia(spark, 12)
    val feats = Multimodal.extractFeatures(items)
    val joined = items.join(
      feats.toDF("media_id", "kind2", "n_bytes", "digest", "features", "decoded"), "media_id")
    assert(joined.count() == 12)
  }

  test("VideoHeader parses MP4 mvhd duration and tkhd dimensions from raw boxes") {
    import spark.implicits._
    import java.nio.ByteBuffer
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length); b.put(typ.getBytes("US-ASCII")); b.put(payload)
      b.array()
    }
    // mvhd v0: version/flags, ctime, mtime, timescale=1000, duration=5000, then padding
    val mvhd = {
      val b = ByteBuffer.allocate(100)
      b.putInt(0); b.putInt(0); b.putInt(0); b.putInt(1000); b.putInt(5000)
      box("mvhd", b.array())
    }
    // tkhd v0: width/height at payload offsets 76/80 as 16.16 fixed
    val tkhd = {
      val b = ByteBuffer.allocate(84)
      b.position(76); b.putInt(640 << 16); b.putInt(360 << 16)
      box("tkhd", b.array())
    }
    val mp4 = box("ftyp", "isom\u0000\u0000\u0000\u0000".getBytes("US-ASCII")) ++
      box("moov", mvhd ++ box("trak", tkhd))

    assert(Multimodal.VideoHeader.parse(mp4) === Some((5000L, 640, 360)))
    assert(Multimodal.VideoHeader.parse("not a video".getBytes) === None)
    // truncated/corrupt box sizes must not crash or loop
    assert(Multimodal.VideoHeader.parse(mp4.take(20)) === None)
    // truncated mvhd payload: bounds check yields duration -1, dims still parse
    val shortMvhd = box("ftyp", "isom0000".getBytes("US-ASCII")) ++
      box("moov", box("mvhd", Array[Byte](0, 0, 0, 0)) ++ box("trak", tkhd))
    assert(Multimodal.VideoHeader.parse(shortMvhd) === Some((-1L, 640, 360)))
    // audio trak BEFORE video trak: first trak with nonzero dims wins
    val audioTkhd = box("tkhd", new Array[Byte](84)) // all-zero dims
    val audioFirst = box("ftyp", "isom0000".getBytes("US-ASCII")) ++
      box("moov", mvhd ++ box("trak", audioTkhd) ++ box("trak", tkhd))
    assert(Multimodal.VideoHeader.parse(audioFirst) === Some((5000L, 640, 360)))
    // impossible box size (2..7) aborts the walk instead of mis-scanning
    val corrupt = box("ftyp", "isom0000".getBytes("US-ASCII")) ++
      Array[Byte](0, 0, 0, 4) ++ "moov".getBytes("US-ASCII")
    assert(Multimodal.VideoHeader.parse(corrupt) === None)

    val items = Seq(
      Multimodal.MediaItem(7L, "video", mp4, "application/octet-stream", -1, -1, -1L)).toDS()
    val out = Multimodal.annotateDims(items).collect().head
    assert(out.mime === "video/mp4" && out.duration_ms === 5000L)
    assert(out.width === 640 && out.height === 360)

    // composition: frame sampling over the REAL container duration
    val frames = Multimodal.sampleFrames(
      Multimodal.annotateDims(items), everyMs = 1000L, maxFrames = 100)
    assert(frames.count() === 5L, "5000 ms at 1 fps = 5 sampled frames")
  }
}
