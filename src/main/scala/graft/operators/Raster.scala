package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Raster image products — the engine-level form of the reference's
  * matplotlib plotting (`generate_SNR_images` scripts/
  * generate_images_results.py:70-139 plots S/N vs time;
  * `dynamic_spectra` :163-189 renders the dynspec grid and shrinks the
  * PNG under a byte budget). JDK-only (`java.awt.image.BufferedImage` +
  * `javax.imageio`): geometry rendering, no font dependency, so it runs
  * on any headless executor.
  *
  * Scale shape: rendering is per-observation — groupBy(key) →
  * collect_list of that key's bounded curve/grid (nsub × nchan cells, KB
  * not GB) → one map call emits the PNG bytes as a binary column. A
  * million observations render with full cluster parallelism and no
  * driver involvement; write the frame with any binary-capable sink.
  */
object Raster {

  /** Viridis-like perceptual colormap (public anchor points), v ∈ [0,1] →
    * packed RGB. Out-of-range and NaN clamp to the ends. */
  def colormap(v: Double): Int = {
    val anchors = Array(
      (0.267, 0.005, 0.329), (0.283, 0.141, 0.458), (0.254, 0.265, 0.530),
      (0.207, 0.372, 0.553), (0.164, 0.471, 0.558), (0.128, 0.567, 0.551),
      (0.135, 0.659, 0.518), (0.267, 0.749, 0.441), (0.478, 0.821, 0.318),
      (0.741, 0.873, 0.150), (0.993, 0.906, 0.144))
    val x = if (v.isNaN) 0.0 else math.min(1.0, math.max(0.0, v))
    val pos = x * (anchors.length - 1)
    val i = math.min(anchors.length - 2, pos.toInt)
    val f = pos - i
    def ch(a: Double, b: Double): Int = math.round(((a + (b - a) * f) * 255)).toInt
    val (r0, g0, b0) = anchors(i)
    val (r1, g1, b1) = anchors(i + 1)
    (ch(r0, r1) << 16) | (ch(g0, g1) << 8) | ch(b0, b1)
  }

  private def encodePng(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Dynamic-spectrum heatmap: one `cellSize`×`cellSize` block per
    * (timeIdx, chanIdx) cell, flux normalized to the grid's own min/max
    * (matplotlib's default autoscaling), missing cells black. Image is
    * exactly (maxTime+1)·cellSize × (maxChan+1)·cellSize pixels — time on
    * x like the reference's plot, channel 0 at the BOTTOM row (origin
    * lower-left, the psrflux convention). */
  def heatmapPng(cells: Seq[(Int, Int, Double)], cellSize: Int = 4): Array[Byte] = {
    require(cells.nonEmpty, "heatmapPng: empty grid")
    require(cellSize >= 1, s"cellSize must be >= 1, got $cellSize")
    val nT = cells.iterator.map(_._1).max + 1
    val nC = cells.iterator.map(_._2).max + 1
    val finite = cells.iterator.map(_._3).filterNot(_.isNaN)
    val (lo, hi) = finite.foldLeft((Double.MaxValue, Double.MinValue)) {
      case ((l, h), v) => (math.min(l, v), math.max(h, v))
    }
    val span = if (hi > lo) hi - lo else 1.0
    val img = new BufferedImage(nT * cellSize, nC * cellSize, BufferedImage.TYPE_INT_RGB)
    cells.foreach { case (t, c, v) =>
      val rgb = colormap((v - lo) / span)
      val y0 = (nC - 1 - c) * cellSize
      var dy = 0
      while (dy < cellSize) {
        var dx = 0
        while (dx < cellSize) {
          img.setRGB(t * cellSize + dx, y0 + dy, rgb)
          dx += 1
        }
        dy += 1
      }
    }
    encodePng(img)
  }

  /** Line plot of (x, y) points: white background, dark axes box with
    * tick marks, blue polyline — the geometry of the reference's
    * `plt.plot` S/N products without a font dependency. */
  def linePng(points: Seq[(Double, Double)], width: Int = 640, height: Int = 480,
              title: String = "", xLabel: String = "", yLabel: String = ""): Array[Byte] =
    encodePng(lineImage(points, width, height, None, None,
      Labels(title, xLabel, yLabel)))

  /** Plot text: title (top center), x-axis label (bottom center),
    * y-axis label (left, rotated 90°) — the glyphs the reference's
    * matplotlib products carry (generate_images_results.py:100-139
    * `plt.title/xlabel/ylabel`). Rendered with the JDK's built-in
    * logical SansSerif font, which works headless with no font files
    * installed. Empty strings draw nothing (and suppress the numeric
    * tick labels), keeping unlabeled renders byte-stable. */
  final case class Labels(title: String = "", xLabel: String = "", yLabel: String = "") {
    def isEmpty: Boolean = title.isEmpty && xLabel.isEmpty && yLabel.isEmpty
  }

  /** Compact tick-value text: matplotlib-ish general format. */
  private def tickText(v: Double): String = {
    val a = math.abs(v)
    if (v == 0.0) "0"
    else if (a >= 0.01 && a < 100000) {
      val s = f"$v%.2f"
      if (s.endsWith(".00")) s.dropRight(3) else s
    } else f"$v%.2e"
  }

  /** [[linePng]]'s renderer with optionally FIXED axis ranges — what the
    * animation frames need (per-frame autoscaling would make motion
    * indistinguishable from rescaling). */
  private def lineImage(points: Seq[(Double, Double)], width: Int, height: Int,
                        xRange: Option[(Double, Double)],
                        yRange: Option[(Double, Double)],
                        labels: Labels = Labels()): BufferedImage = {
    require(points.nonEmpty, "linePng: no points")
    require(width >= 64 && height >= 64, "image too small")
    val sorted = points.sortBy(_._1)
    val (xLo, xHi) = xRange.getOrElse((sorted.head._1, sorted.last._1))
    val ys = sorted.map(_._2)
    val (yLo, yHi) = yRange.getOrElse((ys.min, ys.max))
    val xSpan = if (xHi > xLo) xHi - xLo else 1.0
    val ySpan = if (yHi > yLo) yHi - yLo else 1.0
    val (mL, mR, mT, mB) = (48, 16, 16, 36) // margins: axis room like matplotlib's
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setColor(java.awt.Color.WHITE)
      g.fillRect(0, 0, width, height)
      g.setColor(new java.awt.Color(0x33, 0x33, 0x33))
      g.drawRect(mL, mT, width - mL - mR - 1, height - mT - mB - 1)
      // 5 ticks per axis
      (0 to 4).foreach { i =>
        val tx = mL + i * (width - mL - mR - 1) / 4
        val ty = mT + i * (height - mT - mB - 1) / 4
        g.drawLine(tx, height - mB - 1, tx, height - mB + 4)
        g.drawLine(mL - 5, ty, mL - 1, ty)
      }
      def px(x: Double): Int = mL + ((x - xLo) / xSpan * (width - mL - mR - 2)).toInt
      def py(y: Double): Int = (height - mB - 2) - ((y - yLo) / ySpan * (height - mT - mB - 2)).toInt
      g.setColor(new java.awt.Color(0x1f, 0x77, 0xb4)) // matplotlib C0 blue
      sorted.sliding(2).foreach {
        case Seq((x0, y0), (x1, y1)) => g.drawLine(px(x0), py(y0), px(x1), py(y1))
        case _                       => () // single point: dot below
      }
      if (sorted.size == 1) g.fillOval(px(sorted.head._1) - 2, py(sorted.head._2) - 2, 5, 5)
      if (!labels.isEmpty) {
        g.setRenderingHint(java.awt.RenderingHints.KEY_TEXT_ANTIALIASING,
          java.awt.RenderingHints.VALUE_TEXT_ANTIALIAS_ON)
        g.setColor(new java.awt.Color(0x22, 0x22, 0x22))
        val axisFont = new java.awt.Font(java.awt.Font.SANS_SERIF, java.awt.Font.PLAIN, 12)
        val tickFont = new java.awt.Font(java.awt.Font.SANS_SERIF, java.awt.Font.PLAIN, 9)
        def centered(s: String, cx: Int, baseline: Int): Unit = {
          val w = g.getFontMetrics.stringWidth(s)
          g.drawString(s, cx - w / 2, baseline)
        }
        if (labels.title.nonEmpty) {
          g.setFont(axisFont.deriveFont(java.awt.Font.BOLD))
          centered(labels.title, mL + (width - mL - mR) / 2, mT - 4)
        }
        if (labels.xLabel.nonEmpty) {
          g.setFont(axisFont)
          centered(labels.xLabel, mL + (width - mL - mR) / 2, height - 6)
        }
        if (labels.yLabel.nonEmpty) {
          g.setFont(axisFont)
          val old = g.getTransform
          g.rotate(-math.Pi / 2, 12, mT + (height - mT - mB) / 2)
          centered(labels.yLabel, 12, mT + (height - mT - mB) / 2 + 4)
          g.setTransform(old)
        }
        // numeric tick labels at the 5 ticks of each axis
        g.setFont(tickFont)
        val fm = g.getFontMetrics
        (0 to 4).foreach { i =>
          val tx = mL + i * (width - mL - mR - 1) / 4
          val ty = mT + i * (height - mT - mB - 1) / 4
          centered(tickText(xLo + xSpan * i / 4.0), tx, height - mB + 15)
          val ys = tickText(yHi - ySpan * i / 4.0)
          g.drawString(ys, mL - 7 - fm.stringWidth(ys), ty + 3)
        }
      }
    } finally g.dispose()
    img
  }

  /** Re-encode under `maxBytes` by LANCZOS-free bilinear downscale — the
    * reference's while-loop (`dynamic_spectra`, generate_images_results
    * .py:180-189: shrink by 8e5/size until the PNG fits the budget). */
  def shrinkToBudget(png: Array[Byte], maxBytes: Int): Array[Byte] = {
    require(maxBytes >= 1024, s"budget too small: $maxBytes")
    var bytes = png
    while (bytes.length > maxBytes) {
      val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val factor = math.min(0.9, 0.8 * maxBytes.toDouble / bytes.length)
      val w = math.max(16, (img.getWidth * factor).toInt)
      val h = math.max(16, (img.getHeight * factor).toInt)
      val scaled = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = scaled.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      bytes = encodePng(scaled)
      if (w == 16 && h == 16) return bytes // floor reached; stop regardless
    }
    bytes
  }

  /** Per-key S/N-curve PNGs (`generate_SNR_images`): one image per key
    * from its (x, y) points. Output: (key, png, n_points, width,
    * height). A key whose EVERY point is null still emits a row — with
    * a null `png` and `n_points = 0` — so callers reconciling expected
    * keys against rendered outputs see an explicit signal, not a
    * silently missing file.
    *
    * Labels mirror the reference's per-key products: `title` may carry
    * the `{0}` placeholder, substituted with the key (matplotlib's
    * `title.format(label)`, generate_images_results.py:131); `xLabel` /
    * `yLabel` are drawn verbatim ("Time (seconds)" / "SNR" in the SNR
    * products). Empty strings render the unlabeled form unchanged. */
  def renderCurves(df: DataFrame, keyCol: String, xCol: String, yCol: String,
                   width: Int = 640, height: Int = 480,
                   title: String = "", xLabel: String = "", yLabel: String = ""): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pts0 = df.select(col(keyCol).cast("string").as("k"),
      col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
    // drop unplottable null points, not the key
    val grouped = pts0.filter(col("x").isNotNull && col("y").isNotNull)
      .groupBy("k")
      .agg(collect_list(struct(col("x"), col("y"))).as("pts"))
    // null-safe join: a null key is a legal group and must keep its points
    val keys = pts0.select("k").distinct()
    keys.join(grouped, keys("k") <=> grouped("k"), "left")
      .select(keys("k"), grouped("pts"))
      .as[(String, Seq[(Double, Double)])]
      .map { case (k, pts0) =>
        val pts = Option(pts0).getOrElse(Seq.empty)
        if (pts.isEmpty) (k, null: Array[Byte], 0, width, height)
        else {
          val t = title.replace("{0}", String.valueOf(k))
          (k, linePng(pts, width, height, t, xLabel, yLabel), pts.size, width, height)
        }
      }
      .toDF(keyCol, "png", "n_points", "width", "height")
  }

  /** Animated multi-frame GIF — the JDK-only stand-in for the
    * reference's ffmpeg movie assembly (make_stokes_movie.py:57-112
    * strings per-epoch Stokes frames into an mp4): ImageIO's GIF writer
    * in sequence mode, a GraphicControlExtension per frame carrying the
    * delay (centiseconds), and a NETSCAPE2.0 application extension on
    * the first frame so players loop. Pure `javax.imageio` — runs on
    * headless executors like the PNG paths. */
  def gifBytes(frames: Seq[BufferedImage], delayCs: Int = 20,
               loop: Boolean = true): Array[Byte] = {
    require(frames.nonEmpty, "gifBytes: no frames")
    require(delayCs >= 1, s"delayCs must be >= 1, got $delayCs")
    val writer = ImageIO.getImageWritersBySuffix("gif").next()
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.zipWithIndex.foreach { case (img, idx) =>
        val param = writer.getDefaultWriteParam
        val meta = writer.getDefaultImageMetadata(
          new javax.imageio.ImageTypeSpecifier(img), param)
        val fmt = meta.getNativeMetadataFormatName // javax_imageio_gif_image_1.0
        val root = meta.getAsTree(fmt)
          .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        val gce = childNode(root, "GraphicControlExtension")
        gce.setAttribute("disposalMethod", "none")
        gce.setAttribute("userInputFlag", "FALSE")
        gce.setAttribute("transparentColorFlag", "FALSE")
        gce.setAttribute("transparentColorIndex", "0")
        gce.setAttribute("delayTime", delayCs.toString)
        if (idx == 0 && loop) {
          val exts = childNode(root, "ApplicationExtensions")
          val app = new javax.imageio.metadata.IIOMetadataNode("ApplicationExtension")
          app.setAttribute("applicationID", "NETSCAPE")
          app.setAttribute("authenticationCode", "2.0")
          app.setUserObject(Array[Byte](1, 0, 0)) // sub-block 1 + loop count 0 = forever
          exts.appendChild(app)
        }
        meta.setFromTree(fmt, root)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta), param)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    out.toByteArray
  }

  /** A REAL movie container, pure JDK: Motion-JPEG in AVI (RIFF). The
    * closest JDK-only analog to the reference's ffmpeg mp4 assembly
    * (make_stokes_movie.py:103-112) — the JDK has no H.264 encoder, but
    * it HAS a JPEG encoder, and MJPEG-AVI is a first-class container
    * every mainstream player and ffmpeg itself read (and can transcode
    * to mp4 losslessly in one pass). Layout: RIFF('AVI ') → LIST hdrl
    * (avih + LIST strl(strh 'vids'/'MJPG' + strf BITMAPINFOHEADER)) →
    * LIST movi ('00dc' JPEG chunk per frame, even-padded) → idx1
    * keyframe index (every MJPEG frame is a keyframe). All frames must
    * share the first frame's dimensions. */
  def aviMjpegBytes(frames: Seq[BufferedImage], fps: Int = 5): Array[Byte] = {
    require(frames.nonEmpty, "aviMjpegBytes: no frames")
    require(fps >= 1, s"fps must be >= 1, got $fps")
    val w = frames.head.getWidth
    val h = frames.head.getHeight
    require(frames.forall(f => f.getWidth == w && f.getHeight == h),
      "aviMjpegBytes: all frames must share dimensions")
    val jpegs = frames.map { f =>
      // JPEG writer wants RGB without alpha
      val rgb =
        if (f.getType == BufferedImage.TYPE_INT_RGB) f
        else {
          val c = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          val g = c.createGraphics(); try g.drawImage(f, 0, 0, null) finally g.dispose()
          c
        }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(rgb, "jpg", bos)
      bos.toByteArray
    }
    val maxFrame = jpegs.map(_.length).max

    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def fcc(s: String): Array[Byte] = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      fcc(id) ++ le32(body.length) ++ body ++ pad
    }
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      fcc("LIST") ++ le32(body.length + 4) ++ fcc(typ) ++ body

    val avih = chunk("avih",
      le32(1000000 / fps) ++ le32(0) ++ le32(0) ++ le32(0x10 /* HASINDEX */) ++
        le32(frames.size) ++ le32(0) ++ le32(1) ++ le32(maxFrame) ++
        le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val strh = chunk("strh",
      fcc("vids") ++ fcc("MJPG") ++ le32(0) ++ le16(0) ++ le16(0) ++ le32(0) ++
        le32(1) ++ le32(fps) ++ le32(0) ++ le32(frames.size) ++
        le32(maxFrame) ++ le32(10000) ++ le32(0) ++
        le16(0) ++ le16(0) ++ le16(w) ++ le16(h))
    val strf = chunk("strf",
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++ fcc("MJPG") ++
        le32(w * h * 3) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))

    val moviChunks = jpegs.map(j => chunk("00dc", j))
    val movi = list("movi", moviChunks.toArray.flatten)
    // idx1 offsets are from the movi LIST's type fourcc (offset 4 points
    // at the first chunk id — the convention players expect)
    val offsets = moviChunks.scanLeft(4)((off, c) => off + c.length)
    val idx1 = chunk("idx1",
      jpegs.zip(offsets).flatMap { case (j, off) =>
        fcc("00dc") ++ le32(0x10 /* KEYFRAME */) ++ le32(off) ++ le32(j.length)
      }.toArray)

    val body = fcc("AVI ") ++ hdrl ++ movi ++ idx1
    fcc("RIFF") ++ le32(body.length) ++ body
  }

  /** Find-or-append a named child of a GIF metadata tree node. */
  private def childNode(root: javax.imageio.metadata.IIOMetadataNode,
                        name: String): javax.imageio.metadata.IIOMetadataNode = {
    var n = root.getFirstChild
    while (n != null) {
      if (n.getNodeName == name)
        return n.asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      n = n.getNextSibling
    }
    val fresh = new javax.imageio.metadata.IIOMetadataNode(name)
    root.appendChild(fresh)
    fresh
  }

  /** Per-key animated line-plot GIFs — the reference's LAST output
    * surface (make_stokes_movie.py: per-epoch aligned Stokes profiles
    * strung into a movie). One frame per distinct `frameCol` value in
    * ascending order, each a [[linePng]]-geometry plot of that frame's
    * (x, y) points with axes FIXED to the key's global x/y range
    * (per-frame autoscaling would turn profile motion into axis
    * rescaling). Output: (key, gif, n_frames, width, height).
    *
    * Scale shape: identical to [[renderCurves]] — groupBy(key) over
    * bounded per-observation cells (epochs × nbin points, KB not GB),
    * one map call per key emits the GIF binary executor-side. */
  def renderAnimation(df: DataFrame, keyCol: String, frameCol: String,
                      xCol: String, yCol: String,
                      width: Int = 640, height: Int = 480,
                      delayCs: Int = 20): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pts0 = df.select(col(keyCol).cast("string").as("k"),
      col(frameCol).cast("long").as("f"),
      col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
    // null frame/coordinate cells can't be plotted — drop the POINT,
    // not the key (a single null flux would otherwise NPE the typed
    // decode below and fail the whole per-key GIF job); a key with ZERO
    // plottable points still emits an explicit (null gif, 0 frames) row
    val grouped = pts0
      .filter(col("f").isNotNull && col("x").isNotNull && col("y").isNotNull)
      .groupBy("k")
      .agg(collect_list(struct(col("f"), col("x"), col("y"))).as("pts"))
    // null-safe join: a null key is a legal group and must keep its points
    val keys = pts0.select("k").distinct()
    keys.join(grouped, keys("k") <=> grouped("k"), "left")
      .select(keys("k"), grouped("pts"))
      .as[(String, Seq[(Long, Double, Double)])]
      .map { case (k, pts0) =>
        val pts = Option(pts0).getOrElse(Seq.empty)
        if (pts.isEmpty) (k, null: Array[Byte], 0, width, height)
        else {
          val frames = pts.groupBy(_._1).toSeq.sortBy(_._1)
          val xr = Some((pts.iterator.map(_._2).min, pts.iterator.map(_._2).max))
          val yr = Some((pts.iterator.map(_._3).min, pts.iterator.map(_._3).max))
          val imgs = frames.map { case (_, fp) =>
            lineImage(fp.map(p => (p._2, p._3)), width, height, xr, yr)
          }
          (k, gifBytes(imgs, delayCs), frames.size, width, height)
        }
      }
      .toDF(keyCol, "gif", "n_frames", "width", "height")
  }

  /** Per-key dynamic-spectrum PNGs (`dynamic_spectra`): one heatmap per
    * key from its (timeIdx, chanIdx, flux) cells, optionally shrunk to
    * `maxBytes`. Output: (key, png, n_time, n_chan, width, height) —
    * width/height are the PRE-shrink grid dims (cell-exact contract). */
  def renderDynspec(df: DataFrame, keyCol: String, timeCol: String, chanCol: String,
                    fluxCol: String, cellSize: Int = 4,
                    maxBytes: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cells0 = df.select(col(keyCol).cast("string").as("k"),
      col(timeCol).cast("int").as("t"), col(chanCol).cast("int").as("c"),
      col(fluxCol).cast("double").as("v"))
    // null cells can't be painted — drop the cell, not the key (a
    // missing (t,c) just keeps the background color, matching the
    // reference's masked-pixel behavior); an all-null key still emits
    // an explicit (null png, 0×0) row
    val grouped = cells0
      .filter(col("t").isNotNull && col("c").isNotNull && col("v").isNotNull)
      .groupBy("k")
      .agg(collect_list(struct(col("t"), col("c"), col("v"))).as("cells"))
    // null-safe join: a null key is a legal group and must keep its cells
    val keys = cells0.select("k").distinct()
    keys.join(grouped, keys("k") <=> grouped("k"), "left")
      .select(keys("k"), grouped("cells"))
      .as[(String, Seq[(Int, Int, Double)])]
      .map { case (k, cells0) =>
        val cells = Option(cells0).getOrElse(Seq.empty)
        if (cells.isEmpty) (k, null: Array[Byte], 0, 0, 0, 0)
        else {
          val nT = cells.iterator.map(_._1).max + 1
          val nC = cells.iterator.map(_._2).max + 1
          val png0 = heatmapPng(cells, cellSize)
          val png = maxBytes.fold(png0)(shrinkToBudget(png0, _))
          (k, png, nT, nC, nT * cellSize, nC * cellSize)
        }
      }
      .toDF(keyCol, "png", "n_time", "n_chan", "width", "height")
  }
}
