package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Nearest-pixel 2D grid lookup with default fallback — the engine-level
  * form of the CHIPASS sky-temperature lookup in
  * `get_tsky_updated` (scripts/fluxcal_meerkat.py:160): continuous
  * coordinates quantize to the nearest grid pixel (`int(pix + 0.5)`),
  * out-of-range or blanked (null) pixels fall back to a default value.
  *
  * The grid broadcasts (sky maps are small relative to facts); the fact
  * scan stays one pass with no shuffle.
  */
object GridLookup {

  /** Grid axis: world coordinate = crval + (pixel - crpix) * cdelt. */
  final case class Axis(crval: Double, crpix: Double, cdelt: Double, n: Int)

  /** Quantize a world coordinate to its nearest pixel index
    * (fluxcal_meerkat.py:186: `ipix = int(pix + 0.5)`). Python `int()`
    * truncates toward zero — NOT floor — so pix+0.5 in (-0.5, 0) maps to
    * pixel 0, not -1; Spark's double→int cast has the same
    * truncate-toward-zero semantics, giving bit-parity. */
  def toPixel(world: Column, axis: Axis): Column =
    ((world - lit(axis.crval)) / lit(axis.cdelt) + lit(axis.crpix) + lit(0.5)).cast("int")

  /** Attach `looked_up`: the grid value at the row's nearest pixel, or
    * `default` when the pixel is out of range or the grid cell is missing/
    * null (blanked pixel).
    *
    * @param grid DataFrame with integer `pix1`, `pix2` and a value column.
    */
  def nearest(df: DataFrame, grid: DataFrame, x: Column, y: Column,
              ax1: Axis, ax2: Axis, gridValueCol: String, default: Double): DataFrame = {
    val withPix = df
      .withColumn("__p1", toPixel(x, ax1))
      .withColumn("__p2", toPixel(y, ax2))
    val g = broadcast(grid.select(
      col("pix1").as("__p1"), col("pix2").as("__p2"),
      col(gridValueCol).as("__gv")))
    // Bounds mirror the reference's `ipix > naxis` check (fluxcal_meerkat
    // .py:195) — pix == n passes the check there but has no grid row, so
    // the null-coalesce default makes the two formulations agree.
    withPix
      .join(g, Seq("__p1", "__p2"), "left")
      .withColumn("looked_up",
        when(col("__p1") < 0 || col("__p1") > ax1.n ||
             col("__p2") < 0 || col("__p2") > ax2.n, lit(default))
          .otherwise(coalesce(col("__gv"), lit(default))))
      .drop("__p1", "__p2", "__gv")
  }

  /** Continuous (fractional) pixel coordinate on an axis. */
  private def toFracPixel(world: Column, axis: Axis): Column =
    (world - lit(axis.crval)) / lit(axis.cdelt) + lit(axis.crpix)

  /** Bilinear grid interpolation — the smooth upgrade over [[nearest]]'s
    * reference-faithful pixel snap (nearest quantizes a half-pixel of
    * systematic error into every lookup; interpolating between the four
    * surrounding cells removes it, the standard refinement when the map
    * resolution is coarse relative to the coordinate precision).
    *
    * Four broadcast joins (one per corner cell) keep the fact scan a
    * SINGLE pass — no explode, no re-aggregation, no row-id contract.
    * A missing/blanked/out-of-range corner contributes `default` at its
    * weight; null/NaN coordinates fall back to `default` entirely, the
    * same degradation [[nearest]] gives them. Adds
    * `looked_up_bilinear`. */
  def bilinear(df: DataFrame, grid: DataFrame, x: Column, y: Column,
               ax1: Axis, ax2: Axis, gridValueCol: String, default: Double): DataFrame = {
    val base = df
      .withColumn("__i1", floor(toFracPixel(x, ax1)).cast("int"))
      .withColumn("__i2", floor(toFracPixel(y, ax2)).cast("int"))
      .withColumn("__d1", toFracPixel(x, ax1) - col("__i1"))
      .withColumn("__d2", toFracPixel(y, ax2) - col("__i2"))
    val joined = Seq((0, 0), (0, 1), (1, 0), (1, 1)).foldLeft(base) {
      case (acc, (o1, o2)) =>
        val g = broadcast(grid.select(
          col("pix1").as(s"__cp1_${o1}_$o2"), col("pix2").as(s"__cp2_${o1}_$o2"),
          col(gridValueCol).as(s"__cv_${o1}_$o2")))
        acc.join(g,
          col(s"__cp1_${o1}_$o2") === col("__i1") + o1 &&
            col(s"__cp2_${o1}_$o2") === col("__i2") + o2,
          "left")
    }
    def w(o1: Int, o2: Int): Column =
      (if (o1 == 0) lit(1.0) - col("__d1") else col("__d1")) *
        (if (o2 == 0) lit(1.0) - col("__d2") else col("__d2"))
    val interp = Seq((0, 0), (0, 1), (1, 0), (1, 1)).map { case (o1, o2) =>
      w(o1, o2) * coalesce(col(s"__cv_${o1}_$o2"), lit(default))
    }.reduce(_ + _)
    val dropCols = Seq("__i1", "__i2", "__d1", "__d2") ++
      Seq((0, 0), (0, 1), (1, 0), (1, 1)).flatMap { case (o1, o2) =>
        Seq(s"__cp1_${o1}_$o2", s"__cp2_${o1}_$o2", s"__cv_${o1}_$o2")
      }
    joined
      // null/NaN coordinates make the weights null → whole-row default,
      // matching nearest's fallback rather than poisoning downstream math
      .withColumn("looked_up_bilinear",
        coalesce(when(interp.isNaN, lit(default)).otherwise(interp), lit(default)))
      .drop(dropCols: _*)
  }
}
