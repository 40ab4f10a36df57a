package graft

import java.awt.image.BufferedImage

import graft.multimodal.{ImageHash, VideoHash}
import graft.operators.{Dedup, Raster}

/** Video near-dup dedup end-to-end on REAL containers: write MJPEG-AVI
  * clips with Raster.aviMjpegBytes, read the frames back, pHash them,
  * and find the re-encoded/brightness-shifted duplicate clip while
  * leaving distinct content alone. */
class VideoHashSpec extends SparkSpec {
  import spark.implicits._

  /** Structured 64×64 frame: diagonal gradient + a seed-positioned
    * bright block (so frames differ), optional brightness shift. */
  private def frame(seed: Int, bright: Int = 0): BufferedImage = {
    val w = 64; val h = 64
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val bx = (seed * 11) % (w - 16)
    val by = (seed * 7) % (h - 16)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val inBlock = x >= bx && x < bx + 16 && y >= by && y < by + 16
        val base = (x * 255 / w + y * 255 / h) / 2 + (if (inBlock) 120 else 0)
        val v = math.min(255, math.max(0, base + bright))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    img
  }

  private def clip(seeds: Seq[Int], bright: Int = 0): Array[Byte] =
    Raster.aviMjpegBytes(seeds.map(s => frame(s, bright)), fps = 5)

  test("mjpegFrames round-trips the container frame count and dimensions") {
    val avi = clip(0 until 6)
    val frames = VideoHash.mjpegFrames(avi)
    assert(frames.length === 6)
    frames.foreach { j =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(j))
      assert(img != null && img.getWidth === 64 && img.getHeight === 64)
    }
  }

  test("corrupt or foreign payloads yield empty fingerprints, not failures") {
    assert(VideoHash.mjpegFrames(Array[Byte](1, 2, 3)) === Nil)
    assert(VideoHash.mjpegFrames("RIFFxxxxWAVE".getBytes ++ Array.fill[Byte](32)(0)) === Nil)
    val truncated = clip(0 until 3).take(40)
    assert(VideoHash.fingerprint(truncated) === Nil)
    assert(VideoHash.fingerprint(null) === Nil)
    // adversarial declared chunk size near Int.MaxValue: `off + 8 + size`
    // wraps negative in Int arithmetic — the walk must stop, not throw
    val wrap = clip(0 until 2)
    val bomb = wrap.clone()
    // first chunk header sits at offset 12; poison its size field
    bomb(16) = -1; bomb(17) = -1; bomb(18) = -1; bomb(19) = 0x7f
    assert(VideoHash.mjpegFrames(bomb) === Nil)
    assert(VideoHash.fingerprint(bomb) === Nil)
  }

  test("sub-grid frames are skipped, not fatal") {
    val tiny = Raster.aviMjpegBytes(Seq(new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)))
    assert(VideoHash.mjpegFrames(tiny).length === 1)
    assert(VideoHash.fingerprint(tiny) === Nil) // below pHash's 32×32 grid
  }

  test("re-encoded brightness-shifted clip fingerprints within a small Hamming distance") {
    val a = VideoHash.fingerprint(clip(0 until 6))
    val b = VideoHash.fingerprint(clip(0 until 6, bright = 10))
    val c = VideoHash.fingerprint(clip(17 until 23))
    assert(a.length === 6 && b.length === 6 && c.length === 6)
    val dupDists = a.zip(b).map { case (x, y) => ImageHash.distance(x, y) }
    val crossDists = a.zip(c).map { case (x, y) => ImageHash.distance(x, y) }
    info(s"dup frame distances: $dupDists; cross: $crossDists")
    // +10 brightness cancels in the AC coefficients except where the
    // bright block saturates (frame 0's corner block): measured ≤ 6 bits
    assert(dupDists.forall(_ <= 7), s"duplicate frames too far apart: $dupDists")
    assert(crossDists.forall(_ > 7), s"distinct frames too close: $crossDists")
  }

  test("end-to-end: frameHashes + nearDupClips finds the duplicate clip only, dropLosers removes it") {
    val rows = Seq(
      (1L, clip(0 until 6)),
      (2L, clip(0 until 6, bright = 10)), // near-dup of clip 1
      (3L, clip(17 until 23)))            // distinct content
    val clips = rows.toDF("clip_id", "avi")
    val frames = VideoHash.frameHashes(clips, "clip_id", "avi").cache()
    assert(frames.count() === 18)
    val pairs = VideoHash.nearDupClips(frames, "clip_id", "frame_idx", "phash",
      maxDist = 3, minFrac = 0.5)
    val got = pairs.select("a_clip", "b_clip", "match_frac")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(p => (p._1, p._2)).toSet === Set((1L, 2L)),
      s"expected only the planted duplicate pair, got ${got.mkString(", ")}")
    assert(got.head._3 >= 0.5)
    val kept = VideoHash.dedupClips(clips, "clip_id", "avi", maxDist = 3, minFrac = 0.5)
      .select("clip_id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L), "the larger-id duplicate clip must drop")
  }
}
