package graft.multimodal

import java.awt.image.BufferedImage

/** Perceptual image hashing — the multimodal end of the dedup pipeline:
  * a 64-bit fingerprint per image such that near-duplicate images (same
  * picture re-encoded, resized, brightness-shifted, lightly cropped)
  * land within a small Hamming distance, while distinct pictures land
  * ~32 bits apart. Paired with [[graft.operators.Dedup.hammingPairs]]
  * (banded Hamming LSH) this is image near-dup dedup at corpus scale:
  * decode + hash is a pure map stage over the binary payload column,
  * then everything downstream is the same bucket-join machinery as text
  * and embedding dedup.
  *
  * Three standard constructions (weakest/cheapest first):
  *  - aHash: 8×8 luma grid, bit = cell above the grid mean;
  *  - dHash: 9×8 luma grid, bit = horizontal gradient sign;
  *  - pHash: 32×32 luma grid → 2D DCT-II → low-frequency 8×8 block
  *    (DC excluded), bit = coefficient above the block median —
  *    the most robust to global brightness/contrast shifts.
  *
  * Everything is deterministic: the luma grid is exact integer-boundary
  * block means over the decoded raster (no Graphics2D interpolation,
  * which varies with rendering hints), and the DCT is plain double
  * arithmetic in a fixed order. No external libs — `javax.imageio`
  * decodes, this file does the math. */
object ImageHash {

  /** Exact block-mean luma grid: cell (cx, cy) averages Rec.601 luma
    * over pixel block [cx·w/gw, (cx+1)·w/gw) × [cy·h/gh, (cy+1)·h/gh)
    * (integer boundaries, every pixel in exactly one cell). Requires
    * w ≥ gw and h ≥ gh. */
  private[multimodal] def lumaGrid(img: BufferedImage, gw: Int, gh: Int): Array[Double] = {
    val w = img.getWidth
    val h = img.getHeight
    require(w >= gw && h >= gh, s"image ${w}x$h smaller than grid ${gw}x$gh")
    val grid = new Array[Double](gw * gh)
    var cy = 0
    while (cy < gh) {
      val y0 = (cy.toLong * h / gh).toInt
      val y1 = ((cy + 1).toLong * h / gh).toInt
      var cx = 0
      while (cx < gw) {
        val x0 = (cx.toLong * w / gw).toInt
        val x1 = ((cx + 1).toLong * w / gw).toInt
        var sum = 0.0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        grid(cy * gw + cx) = sum / ((y1 - y0).toLong * (x1 - x0))
        cx += 1
      }
      cy += 1
    }
    grid
  }

  /** Average hash: 8×8 grid, bit k (MSB-first, k = cy·8+cx) set when
    * the cell's luma exceeds the 64-cell mean. */
  def aHash(img: BufferedImage): Long = {
    val g = lumaGrid(img, 8, 8)
    val mean = g.sum / 64.0
    var bits = 0L
    var k = 0
    while (k < 64) {
      if (g(k) > mean) bits |= 1L << (63 - k)
      k += 1
    }
    bits
  }

  /** Difference hash: 9×8 grid, bit = right neighbor brighter than
    * left — gradient signs survive brightness and contrast shifts. */
  def dHash(img: BufferedImage): Long = {
    val g = lumaGrid(img, 9, 8)
    var bits = 0L
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        if (g(cy * 9 + cx + 1) > g(cy * 9 + cx)) bits |= 1L << (63 - (cy * 8 + cx))
        cx += 1
      }
      cy += 1
    }
    bits
  }

  /** Perceptual hash: 32×32 luma grid → 2D DCT-II → the 8×8
    * lowest-frequency block with the DC term dropped; bit = coefficient
    * above the MEDIAN of the remaining 63 (median = the 32nd smallest,
    * so AT MOST 31 bits are set — scale- and offset-invariant; a
    * structured image sets exactly 31, but median TIES lose bits: a
    * constant-luma image has all 63 AC coefficients equal, so ZERO bits
    * are set — degenerate inputs collapse to hash 0 rather than
    * splitting ties arbitrarily). */
  // DCT-II basis for the 32×32 pHash grid — a constant; computed once
  // per JVM, not per image (pHash is a corpus-scale map stage)
  private val PHashN = 32
  private val cosTab: Array[Array[Double]] =
    Array.tabulate(PHashN, PHashN)((u, x) =>
      math.cos((2 * x + 1) * u * math.Pi / (2.0 * PHashN)))

  def pHash(img: BufferedImage): Long = {
    val n = PHashN
    val g = lumaGrid(img, n, n)
    // separable DCT-II, rows then columns; fixed evaluation order; only
    // the first 8 frequencies per row are ever read, so size to n×8
    val rows = new Array[Double](n * 8)
    var y = 0
    while (y < n) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < n) { s += g(y * n + x) * cosTab(u)(x); x += 1 }
        rows(y * 8 + u) = s
        u += 1
      }
      y += 1
    }
    val coef = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var yy = 0
        while (yy < n) { s += rows(yy * 8 + u) * cosTab(v)(yy); yy += 1 }
        coef(v * 8 + u) = s
        u += 1
      }
      v += 1
    }
    val ac = coef.drop(1).sorted
    val median = ac(31) // 32nd smallest of the 63 AC coefficients
    var bits = 0L
    var k = 1
    while (k < 64) {
      if (coef(k) > median) bits |= 1L << (63 - k)
      k += 1
    }
    bits
  }

  /** Hamming distance between two 64-bit hashes. */
  def distance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  // -------------------------------------------------------------------
  // Option-returning corpus-scale entry points — the raw hashes REQUIRE
  // the image to cover the grid, and one 1×1 tracking pixel in an
  // advertised map stage must degrade to a skipped row, not a failed
  // Spark stage (the same contract as AudioHash.fingerprint returning
  // None for un-hashable input). Callers that have already filtered by
  // decoded dimensions may use the throwing forms directly.
  // -------------------------------------------------------------------

  /** [[aHash]], or None when the image is smaller than its 8×8 grid. */
  def tryAHash(img: BufferedImage): Option[Long] =
    if (img.getWidth >= 8 && img.getHeight >= 8) Some(aHash(img)) else None

  /** [[dHash]], or None when the image is smaller than its 9×8 grid. */
  def tryDHash(img: BufferedImage): Option[Long] =
    if (img.getWidth >= 9 && img.getHeight >= 8) Some(dHash(img)) else None

  /** [[pHash]], or None when the image is smaller than its 32×32 grid. */
  def tryPHash(img: BufferedImage): Option[Long] =
    if (img.getWidth >= PHashN && img.getHeight >= PHashN) Some(pHash(img)) else None
}
