package graft

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import graft.operators.Raster

/** Raster PNG products (generate_images_results.py:70-189): per-key S/N
  * line plots and dynamic-spectrum heatmaps as binary columns, rendered
  * executor-side with JDK-only imaging. */
class RasterSpec extends SparkSpec {
  import spark.implicits._

  private def decode(png: Array[Byte]) = ImageIO.read(new ByteArrayInputStream(png))

  test("heatmapPng pixel dims match the cell grid exactly") {
    val cells = for (t <- 0 until 10; c <- 0 until 6) yield (t, c, (t * c).toDouble)
    val img = decode(Raster.heatmapPng(cells, cellSize = 4))
    assert(img.getWidth === 40 && img.getHeight === 24)
  }

  test("heatmap colors follow the colormap: min dark violet, max bright yellow") {
    val cells = Seq((0, 0, 0.0), (1, 0, 1.0))
    val img = decode(Raster.heatmapPng(cells, cellSize = 2))
    val lo = img.getRGB(0, 0) & 0xffffff
    val hi = img.getRGB(2, 0) & 0xffffff
    assert(lo === Raster.colormap(0.0) && hi === Raster.colormap(1.0))
    // viridis ends: dark violet has blue > red; bright yellow has red ~ green >> blue
    assert((lo & 0xff) > ((lo >> 16) & 0xff))
    assert(((hi >> 16) & 0xff) > 200 && (hi & 0xff) < 160)
  }

  test("linePng renders a non-trivial plot with the requested dims") {
    val pts = (0 until 50).map(i => (i.toDouble, math.sin(i / 5.0)))
    val png = Raster.linePng(pts, width = 320, height = 200)
    val img = decode(png)
    assert(img.getWidth === 320 && img.getHeight === 200)
    // the curve is drawn in matplotlib-C0 blue somewhere inside the axes
    val blue = 0x1f77b4
    val hasCurve = (0 until img.getWidth).exists(x =>
      (0 until img.getHeight).exists(y => (img.getRGB(x, y) & 0xffffff) == blue))
    assert(hasCurve, "no curve pixels found")
  }

  test("shrinkToBudget brings an oversized PNG under the byte budget") {
    val cells = for (t <- 0 until 300; c <- 0 until 200)
      yield (t, c, math.sin(t * 0.37) * math.cos(c * 0.73) + 0.01 * ((t * 31 + c * 17) % 97))
    val big = Raster.heatmapPng(cells, cellSize = 2)
    assert(big.length > 20000, s"fixture too small to exercise shrink: ${big.length}")
    val small = Raster.shrinkToBudget(big, maxBytes = 20000)
    assert(small.length <= 20000)
    assert(decode(small).getWidth < decode(big).getWidth)
  }

  test("renderDynspec emits one PNG per key with cell-exact dims") {
    val rows = for (k <- Seq("obsA", "obsB"); t <- 0 until 8; c <- 0 until 5)
      yield (k, t, c, (t + c).toDouble)
    val out = Raster.renderDynspec(rows.toDF("obs", "time_idx", "chan_idx", "flux"),
        "obs", "time_idx", "chan_idx", "flux", cellSize = 3)
      .as[(String, Array[Byte], Int, Int, Int, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet === Set("obsA", "obsB"))
    out.values.foreach { case (_, png, nT, nC, w, h) =>
      assert((nT, nC, w, h) === ((8, 5, 24, 15)))
      val img = decode(png)
      assert(img.getWidth === w && img.getHeight === h)
    }
  }

  test("gifBytes writes an animated GIF: frame count, dims, loop extension") {
    val frames = (0 until 8).map { f =>
      val img = new java.awt.image.BufferedImage(64, 48,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      try { g.setColor(java.awt.Color.WHITE); g.fillRect(0, 0, 64, 48)
            g.setColor(java.awt.Color.RED); g.drawLine(f * 8, 0, f * 8, 47) }
      finally g.dispose()
      img
    }
    val gif = Raster.gifBytes(frames, delayCs = 5)
    // frame count via the GIF reader (ImageIO.read alone returns frame 0)
    val reader = ImageIO.getImageReadersBySuffix("gif").next()
    reader.setInput(ImageIO.createImageInputStream(new ByteArrayInputStream(gif)))
    assert(reader.getNumImages(true) === 8)
    (0 until 8).foreach { i =>
      val img = reader.read(i)
      assert(img.getWidth === 64 && img.getHeight === 48)
    }
    reader.dispose()
    // NETSCAPE2.0 loop extension must be present (animation loops)
    assert(new String(gif, "ISO-8859-1").contains("NETSCAPE2.0"))
  }

  test("renderAnimation: one GIF per key, frame count == epoch count, profile-grid dims") {
    // Stokes-movie shape: per (pulsar, epoch) an nbin-binned profile
    val nEpochs = 10
    val nBin = 32
    val rows = for (k <- Seq("J1A", "J2B"); e <- 0 until nEpochs; b <- 0 until nBin)
      yield (k, e.toLong, b.toDouble,
        math.exp(-math.pow((b - 16.0 - (if (k == "J1A") e * 0.3 else 0.0)) / 3.0, 2)))
    val out = Raster.renderAnimation(
        rows.toDF("psr", "epoch", "bin", "flux"),
        "psr", "epoch", "bin", "flux", width = 128, height = 96, delayCs = 10)
      .as[(String, Array[Byte], Int, Int, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet === Set("J1A", "J2B"))
    out.values.foreach { case (_, gif, nF, w, h) =>
      assert(nF === nEpochs)
      assert((w, h) === ((128, 96)))
      val reader = ImageIO.getImageReadersBySuffix("gif").next()
      reader.setInput(ImageIO.createImageInputStream(new ByteArrayInputStream(gif)))
      assert(reader.getNumImages(true) === nEpochs)
      val f0 = reader.read(0)
      assert(f0.getWidth === 128 && f0.getHeight === 96)
      reader.dispose()
    }
  }

  test("renderCurves emits one S/N plot per key") {
    val rows = for (k <- Seq(1L, 2L); i <- 0 until 30)
      yield (k, i * 8.0, math.sqrt(i + 1.0) * k)
    val out = Raster.renderCurves(rows.toDF("obs", "t_sec", "snr"), "obs", "t_sec", "snr",
        width = 320, height = 240)
      .as[(String, Array[Byte], Int, Int, Int)].collect()
    assert(out.map(_._1).toSet === Set("1", "2"))
    out.foreach { case (_, png, n, w, h) =>
      assert(n === 30)
      val img = decode(png)
      assert(img.getWidth === w && img.getHeight === h)
    }
  }

  test("plot text: title/xlabel/ylabel/tick labels draw glyph pixels; unlabeled stays byte-stable") {
    val pts = (0 until 50).map(i => (i.toDouble, math.sin(i / 5.0)))
    def darkIn(img: java.awt.image.BufferedImage,
               x0: Int, x1: Int, y0: Int, y1: Int): Boolean =
      (x0 until x1).exists(x => (y0 until y1).exists { y =>
        val rgb = img.getRGB(x, y)
        // glyphs are near-black (0x222222) with antialiased greys — any
        // clearly non-white, non-axis-grey pixel counts
        ((rgb >> 16) & 0xff) < 0x80 && ((rgb >> 8) & 0xff) < 0x80 && (rgb & 0xff) < 0x80
      })
    val labeled = decode(Raster.linePng(pts, width = 320, height = 240,
      title = "Cumulative SNR (J0437)", xLabel = "Time (seconds)", yLabel = "SNR"))
    // title band (above the plot box), xlabel band (below the tick labels),
    // ylabel band (left edge, rotated) each carry glyph pixels
    assert(darkIn(labeled, 48, 320 - 16, 0, 16), "no title glyphs")
    assert(darkIn(labeled, 48, 320 - 16, 240 - 12, 240), "no xlabel glyphs")
    assert(darkIn(labeled, 0, 16, 16, 240 - 36), "no ylabel glyphs")
    // numeric tick labels sit between the plot box and the xlabel
    assert(darkIn(labeled, 32, 320, 240 - 36 + 6, 240 - 16), "no x tick labels")
    // empty labels keep the original unlabeled bytes (frame stability:
    // animation paths reuse this renderer with fixed axes)
    val a = Raster.linePng(pts, width = 320, height = 240)
    val b = Raster.linePng(pts, width = 320, height = 240, title = "", xLabel = "", yLabel = "")
    assert(java.util.Arrays.equals(a, b))
    // renderCurves substitutes {0} with the key and labels every plot
    val rows = for (k <- Seq(1L, 2L); i <- 0 until 30)
      yield (k, i * 8.0, math.sqrt(i + 1.0) * k)
    val out = Raster.renderCurves(rows.toDF("obs", "t_sec", "snr"), "obs", "t_sec", "snr",
        width = 320, height = 240,
        title = "Cumulative SNR ({0})", xLabel = "Time (seconds)", yLabel = "SNR")
      .as[(String, Array[Byte], Int, Int, Int)].collect()
    assert(out.length === 2)
    out.foreach { case (_, png, _, _, _) => assert(darkIn(decode(png), 48, 304, 0, 16)) }
    // different keys → different titles → different title-band pixels
    val imgs = out.sortBy(_._1).map(o => decode(o._2))
    val titleDiffers = (48 until 304).exists(x => (0 until 16).exists(y =>
      imgs(0).getRGB(x, y) != imgs(1).getRGB(x, y)))
    assert(titleDiffers, "per-key {0} titles must differ")
  }

  test("all-null keys emit explicit null-image rows, never vanish") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      ("a", Some(1L), Some(1.0), Some(2.0)),
      ("a", Some(1L), Some(2.0), Some(3.0)),
      ("b", None, None, None),
    ).toDF("obs", "epoch", "x", "y")
    val curves = Raster.renderCurves(df, "obs", "x", "y").collect()
      .map(r => r.getString(0) -> (r.get(1), r.getInt(2))).toMap
    assert(curves.keySet === Set("a", "b"))
    assert(curves("b")._1 == null && curves("b")._2 === 0)
    assert(curves("a")._1 != null && curves("a")._2 === 2)
    val anim = Raster.renderAnimation(df, "obs", "epoch", "x", "y").collect()
      .map(r => r.getString(0) -> r.getInt(2)).toMap
    assert(anim === Map("a" -> 1, "b" -> 0))
    val dyn = Raster.renderDynspec(
        df.select(col("obs"), col("epoch").cast("int").as("t"),
          lit(0).as("c"), col("x").as("v"))
          .withColumn("c", when(col("t").isNull, lit(null).cast("int")).otherwise(col("c"))),
        "obs", "t", "c", "v").collect()
      .map(r => r.getString(0) -> (r.get(1), r.getInt(2))).toMap
    assert(dyn.keySet === Set("a", "b"))
    assert(dyn("b")._1 == null && dyn("b")._2 === 0)
  }

  test("aviMjpegBytes writes a valid MJPEG-AVI: RIFF layout, header counts, decodable frames") {
    val frames = (0 until 4).map { i =>
      val img = new java.awt.image.BufferedImage(64, 48, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      try { g.setColor(new java.awt.Color(40 * i, 80, 255 - 50 * i)); g.fillRect(0, 0, 64, 48) }
      finally g.dispose()
      img
    }
    val avi = Raster.aviMjpegBytes(frames, fps = 10)
    def fcc(off: Int) = new String(avi.slice(off, off + 4), "US-ASCII")
    def le32(off: Int) =
      (avi(off) & 0xff) | ((avi(off + 1) & 0xff) << 8) |
        ((avi(off + 2) & 0xff) << 16) | ((avi(off + 3) & 0xff) << 24)
    assert(fcc(0) === "RIFF" && fcc(8) === "AVI ")
    assert(le32(4) === avi.length - 8, "RIFF size covers the file")
    // avih: first chunk inside LIST hdrl at offset 12
    assert(fcc(12) === "LIST" && fcc(20) === "hdrl" && fcc(24) === "avih")
    val avih = 32
    assert(le32(avih) === 100000, "microseconds per frame at 10 fps")
    assert(le32(avih + 16) === 4, "dwTotalFrames")
    assert(le32(avih + 32) === 64 && le32(avih + 36) === 48, "dims")
    // walk the movi list: every '00dc' payload is a decodable JPEG
    var off = 12
    var moviAt = -1
    while (moviAt < 0) {
      val id = fcc(off)
      val sz = le32(off + 4)
      if (id == "LIST" && fcc(off + 8) == "movi") moviAt = off
      else off += 8 + sz + (sz % 2)
    }
    var p = moviAt + 12
    val end = moviAt + 8 + le32(moviAt + 4)
    var n = 0
    while (p < end) {
      assert(fcc(p) === "00dc")
      val sz = le32(p + 4)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(avi.slice(p + 8, p + 8 + sz)))
      assert(img.getWidth === 64 && img.getHeight === 48)
      n += 1
      p += 8 + sz + (sz % 2)
    }
    assert(n === 4)
    // idx1 follows with one 16-byte keyframe entry per frame
    assert(fcc(end) === "idx1" && le32(end + 4) === 4 * 16)
  }

  test("a NULL key with plottable points keeps them (null-safe join)") {
    import org.apache.spark.sql.functions._
    // key is null but every point is real: groupBy treats null as a
    // group, so the key-preserving join must be null-safe or the group's
    // points silently vanish into a (null image, 0 points) row
    val df = Seq(
      (Option.empty[String], Some(1L), Some(1.0), Some(2.0)),
      (Option.empty[String], Some(2L), Some(2.0), Some(5.0)),
      (Some("a"), Some(1L), Some(3.0), Some(4.0)),
    ).toDF("obs", "epoch", "x", "y")
    val curves = Raster.renderCurves(df, "obs", "x", "y").collect()
      .map(r => Option(r.getString(0)) -> (r.get(1), r.getInt(2))).toMap
    assert(curves.keySet === Set(None, Some("a")))
    assert(curves(None)._1 != null && curves(None)._2 === 2)
    val anim = Raster.renderAnimation(df, "obs", "epoch", "x", "y").collect()
      .map(r => Option(r.getString(0)) -> r.getInt(2)).toMap
    assert(anim === Map(None -> 2, Some("a") -> 1))
    val dyn = Raster.renderDynspec(
        df.select(col("obs"), col("epoch").cast("int").as("t"),
          lit(0).as("c"), col("x").as("v")),
        "obs", "t", "c", "v").collect()
      .map(r => Option(r.getString(0)) -> (r.get(1), r.getInt(2))).toMap
    assert(dyn(None)._1 != null && dyn(None)._2 === 3)
  }
}
