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
    * Each fact row joins its FOUR corner cells in one broadcast join
    * (the corner offsets explode map-side, so the fact scan is still a
    * single pass), then one aggregate recombines the corner values with
    * the usual (1−dx)(1−dy)… weights. Any missing/blanked/out-of-range
    * corner degrades that row to `default` weight-share — rows fully
    * inside a populated grid interpolate exactly; a row with ALL corners
    * missing returns `default`. */
  def bilinear(df: DataFrame, grid: DataFrame, x: Column, y: Column,
               ax1: Axis, ax2: Axis, gridValueCol: String, default: Double,
               rowId: Column): DataFrame = {
    val g = broadcast(grid.select(
      col("pix1").as("__p1"), col("pix2").as("__p2"),
      col(gridValueCol).as("__gv")))
    val fp1 = toFracPixel(x, ax1)
    val fp2 = toFracPixel(y, ax2)
    val base = df
      .withColumn("__rid", rowId)
      .withColumn("__f1", fp1).withColumn("__f2", fp2)
      .withColumn("__i1", floor(col("__f1")).cast("int"))
      .withColumn("__i2", floor(col("__f2")).cast("int"))
      .withColumn("__d1", col("__f1") - col("__i1"))
      .withColumn("__d2", col("__f2") - col("__i2"))
    val corners = base.select(
      col("__rid"), col("__i1"), col("__i2"), col("__d1"), col("__d2"),
      explode(array(
        struct(lit(0).as("o1"), lit(0).as("o2")),
        struct(lit(0).as("o1"), lit(1).as("o2")),
        struct(lit(1).as("o1"), lit(0).as("o2")),
        struct(lit(1).as("o1"), lit(1).as("o2")))).as("__c"))
      .select(col("__rid"),
        (col("__i1") + col("__c.o1")).as("__p1"),
        (col("__i2") + col("__c.o2")).as("__p2"),
        // weight = product of (1-d) for offset 0, d for offset 1, per axis
        ((when(col("__c.o1") === 0, lit(1.0) - col("__d1")).otherwise(col("__d1"))) *
          (when(col("__c.o2") === 0, lit(1.0) - col("__d2")).otherwise(col("__d2"))))
          .as("__w"))
    val contrib = corners
      .join(g, Seq("__p1", "__p2"), "left")
      .groupBy("__rid")
      .agg(sum(col("__w") * coalesce(col("__gv"), lit(default))).as("__interp"))
    base.join(contrib, Seq("__rid"))
      .withColumn("looked_up_bilinear", col("__interp"))
      .drop("__rid", "__f1", "__f2", "__i1", "__i2", "__d1", "__d2", "__interp")
  }
}
