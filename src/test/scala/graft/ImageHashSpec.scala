package graft

import java.awt.image.BufferedImage

import org.apache.spark.sql.functions._

import graft.multimodal.ImageHash
import graft.operators.Dedup

/** Perceptual image hashing (ImageHash aHash/dHash/pHash) + banded
  * Hamming LSH dedup (Dedup.hammingPairs): invariance properties on
  * real encoded PNGs, and the pigeonhole recall guarantee against a
  * brute-force pair scan. */
class ImageHashSpec extends SparkSpec {
  import spark.implicits._

  /** A deterministic synthetic photo-ish image: smooth gradient plus a
    * few rectangles, so the luma grid has real structure. */
  private def picture(w: Int, h: Int, brightness: Int = 0, seed: Int = 7): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var r = (x * 255 / w + brightness).max(0).min(255)
        var g = (y * 255 / h + brightness).max(0).min(255)
        var b = (((x + y) * 127 / (w + h)) + brightness).max(0).min(255)
        // structural features: two rectangles keyed off the seed
        if (x > w / seed && x < w / 3 && y > h / 4 && y < h / 2) { r = 230; g = 40; b = 40 }
        if (x > w / 2 && y > h * 2 / 3) { r = 30; g = 30; b = (200 + brightness).min(255) }
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** A structurally DIFFERENT scene: inverted gradient + stripes. */
  private def otherPicture(w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var r = 255 - x * 255 / w
        var g = 255 - y * 255 / h
        var b = if ((x / 16) % 2 == 0) 220 else 20
        if (y < h / 3 && x > w / 2) { r = 10; g = 240; b = 10 }
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  private def pngRoundTrip(img: BufferedImage): BufferedImage = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bos.toByteArray))
  }

  test("hashes are deterministic and survive a lossless encode round trip") {
    val img = picture(320, 240)
    for (hash <- Seq[BufferedImage => Long](ImageHash.aHash, ImageHash.dHash, ImageHash.pHash)) {
      assert(hash(img) === hash(img))
      assert(hash(pngRoundTrip(img)) === hash(img))
    }
  }

  test("near-duplicates (resize, small brightness shift) land close; distinct images land far") {
    val base = picture(320, 240)
    val resized = picture(257, 193) // same scene rendered at another size
    val brighter = picture(320, 240, brightness = 12)
    val other = otherPicture(320, 240)
    for ((name, hash) <- Seq[(String, BufferedImage => Long)](
        ("aHash", ImageHash.aHash), ("dHash", ImageHash.dHash), ("pHash", ImageHash.pHash))) {
      val hb = hash(base)
      assert(ImageHash.distance(hb, hash(resized)) <= 6, s"$name resize")
      assert(ImageHash.distance(hb, hash(brighter)) <= 6, s"$name brightness")
      assert(ImageHash.distance(hb, hash(other)) >= 10, s"$name distinct")
    }
  }

  test("pHash sets exactly 31 bits (median split of the 63 AC coefficients)") {
    assert(java.lang.Long.bitCount(ImageHash.pHash(picture(320, 240))) === 31)
    assert(java.lang.Long.bitCount(ImageHash.pHash(otherPicture(100, 64))) === 31)
  }

  test("hammingPairs has PERFECT recall within maxDist (pigeonhole) vs brute force") {
    // adversarial hashes: clusters around a few anchors with 1-3 bit
    // flips (inside maxDist), plus far-away noise
    val anchors = Seq(0x0123456789abcdefL, -0x6f9b12c345ddee10L, 0x7fffffff00000001L)
    val rows = anchors.zipWithIndex.flatMap { case (a, ai) =>
      Seq((ai * 100L, a),
        (ai * 100L + 1, a ^ 1L),
        (ai * 100L + 2, a ^ (1L << 63) ^ (1L << 17)),
        (ai * 100L + 3, a ^ (1L << 40) ^ (1L << 39) ^ 4L),
        (ai * 100L + 50, a ^ 0x00ff00ff00ff00ffL)) // far away
    }
    val df = rows.toDF("id", "fp")
    val maxDist = 3
    val got = Dedup.hammingPairs(df, "fp", "id", maxDist, bands = 4)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val brute = (for {
      (i1, h1) <- rows; (i2, h2) <- rows
      if i1 < i2 && java.lang.Long.bitCount(h1 ^ h2) <= maxDist
    } yield (i1, i2)).toSet
    assert(got === brute, "banded candidates must find EVERY pair within maxDist")
    assert(brute.nonEmpty)
  }

  test("dedupCorpusByHammingHash keeps one survivor per fingerprint cluster") {
    val df = Seq(
      (1L, 100L), (2L, 101L), (3L, 100L ^ (1L << 62)), // cluster of 3 (dist<=2 chain)
      (9L, 0x7a7a7a7a7a7a7a7aL), // singleton
    ).toDF("id", "fp")
    val kept = Dedup.dedupCorpusByHammingHash(df, "fp", "id", maxDist = 2, bands = 4)
      .select("id").as[Long].collect().toSet
    assert(kept === Set(1L, 9L))
  }

  test("end to end: decoded PNG payloads -> pHash column -> near-dup drop") {
    def png(img: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val items = Seq(
      (1L, png(picture(320, 240))),
      (2L, png(picture(320, 240, brightness = 8))), // near-dup of 1
      (3L, png(otherPicture(320, 240))),            // distinct
    ).toDF("id", "payload")
    val hashed = items.as[(Long, Array[Byte])].map { case (id, bytes) =>
      val img = graft.multimodal.Multimodal.ImageCodec.decode(bytes).get
      (id, ImageHash.pHash(img))
    }.toDF("id", "fp")
    val kept = Dedup.dedupCorpusByHammingHash(hashed, "fp", "id", maxDist = 3, bands = 4)
      .select("id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L))
  }
}
