package graft

import org.apache.spark.sql.functions._

import graft.operators.{FluxCal, GridLookup}
import graft.sources.Catalogs

/** End-to-end flux calibration against a scalar re-derivation of the
  * reference formulas (fluxcal_meerkat.py main flow): LBAND grid path,
  * UHF catalogue path (recalled + default), SBAND passthrough. */
class FluxCalSpec extends SparkSpec {
  import spark.implicits._

  private val ax = GridLookup.Axis(crval = 0.0, crpix = 0.0, cdelt = 1.0, n = 360)
  private val axDec = GridLookup.Axis(crval = 0.0, crpix = 90.0, cdelt = 1.0, n = 181)

  test("bandOf mirrors get_band including the string BW comparison (archive_utils.py:22)") {
    val df = Seq(
      ("544.0", 815.5), ("544.0", 820.0), ("856.0", 1283.58),
      ("875.0", 2187.5), ("875.0", 2406.2), ("875.0", 2626.0),
      ("875.0", 2843.0), ("875.0", 3062.0), ("123.0", 5000.0),
    ).toDF("bw", "freq")
    val got = df.select(FluxCal.bandOf(col("bw"), col("freq"))).as[Option[String]].collect().toSeq
    assert(got == Seq(Some("UHF"), None, Some("LBAND"), Some("SBAND_0"), Some("SBAND_1"),
      Some("SBAND_2"), Some("SBAND_3"), Some("SBAND_4"), None))
  }

  test("multipliers: LBAND grid, UHF catalogue + default, SBAND passthrough") {
    // obs: (obs_id, psr, bw, freq, rajd, decjd, nant, tobs, nbin, obs_bw, nchan)
    val obs = Seq(
      (1L, "J0001+0001", "856.0", 1283.58, 100.3, 45.2, 60.0, 1800.0, 1024.0, 856.0, 928.0),
      (2L, "J0002-0002", "544.0", 815.5, 10.0, -20.0, 58.0, 900.0, 1024.0, 544.0, 928.0),
      (3L, "J9999-9999", "544.0", 815.5, 10.0, -20.0, 58.0, 900.0, 1024.0, 544.0, 928.0),
      (4L, "J0003+0003", "875.0", 2187.5, 10.0, -20.0, 60.0, 900.0, 1024.0, 875.0, 928.0),
    ).toDF("obs_id", "psr", "bw", "freq", "rajd", "decjd", "nant", "tobs", "nbin", "obs_bw", "nchan")

    // grid cell covering obs 1's (rajd=100.3→pix 100, decjd=45.2→pix 135)
    val grid = Seq((100, 135, 4100.0)).toDF("pix1", "pix2", "tsky_mk")
    val uhfCat = Catalogs.fromText(spark, "J0002-0002 9.3\n")

    // channel RMS: obs 1 gets 3 in-window LBAND channels (odd median),
    // obs 2/3 get 2 in-window UHF channels (even → np.median = mean)
    val chanRms = Seq(
      (1L, 1390.0, 0.20), (1L, 1385.0, 0.30), (1L, 1395.0, 0.40), (1L, 1500.0, 9.9),
      (2L, 800.0, 0.10), (2L, 802.0, 0.30), (2L, 900.0, 9.9),
      (3L, 800.0, 0.50), (3L, 802.0, 0.70),
    ).toDF("obs_id", "chan_freq", "offrms")

    val out = FluxCal.multipliers(obs, chanRms, grid, ax, axDec, uhfCat)
      .collect().map(r => r.getAs[Long]("obs_id") -> r).toMap

    // scalar re-derivation, LBAND (obs 1): tsky 4100 mK from the grid
    val tskyJy1 = 1.7202 * (4100.0 - 3372.0) * (19.0 / 1000.0)
    val ssys1 = (390.0 + tskyJy1) / 60.0
    val exp1 = ssys1 / math.sqrt(2.0 * 856.0 / 928.0 * 1800.0 / 1024.0)
    val mult1 = exp1 / 0.30 // median of (0.20, 0.30, 0.40); 1500 MHz excluded
    assert(math.abs(out(1L).getAs[Double]("multiplier") - mult1) < 1e-12)

    // UHF catalogued (obs 2): tsky 9.3 K → 9.3*19 Jy; np.median of 2 = mean
    val tskyJy2 = 9.3 * 19.0
    val ssys2 = (18.5 * 19.0 + tskyJy2) / 58.0
    val exp2 = ssys2 / math.sqrt(2.0 * 544.0 / 928.0 * 900.0 / 1024.0)
    val mult2 = exp2 / ((0.10 + 0.30) / 2.0)
    assert(math.abs(out(2L).getAs[Double]("multiplier") - mult2) < 1e-12)

    // UHF uncatalogued (obs 3): default 5.5 K
    val tskyJy3 = 5.5 * 19.0
    val ssys3 = (18.5 * 19.0 + tskyJy3) / 58.0
    val exp3 = ssys3 / math.sqrt(2.0 * 544.0 / 928.0 * 900.0 / 1024.0)
    val mult3 = exp3 / ((0.50 + 0.70) / 2.0)
    assert(math.abs(out(3L).getAs[Double]("multiplier") - mult3) < 1e-12)

    // SBAND (obs 4): multiplier 1.0, no calibration columns
    assert(out(4L).getAs[Double]("multiplier") == 1.0)
    assert(out(4L).isNullAt(out(4L).fieldIndex("tsky_jy")))
  }

  test("applyMultipliers scales value columns per obs (fluxcalibrate, fluxcal_meerkat.py:344)") {
    import spark.implicits._
    // decimated products: (obs_id, chan, flux, weight); obs 3 has no
    // multiplier row and must pass through unscaled
    val values = Seq(
      (1L, 0, 2.0, 10.0), (1L, 1, 3.0, 20.0),
      (2L, 0, 4.0, 40.0),
      (3L, 0, 8.0, 80.0),
    ).toDF("obs_id", "chan", "flux", "weight")
    val mults = Seq((1L, 2.5), (2L, 0.5)).toDF("obs_id", "multiplier")
    val out = FluxCal.applyMultipliers(values, mults, Seq("flux", "weight"))
      .select("obs_id", "chan", "flux", "weight")
      .as[(Long, Int, Double, Double)].collect().toSet
    assert(out == Set(
      (1L, 0, 2.0 * 2.5, 10.0 * 2.5), (1L, 1, 3.0 * 2.5, 20.0 * 2.5),
      (2L, 0, 4.0 * 0.5, 40.0 * 0.5),
      (3L, 0, 8.0, 80.0),
    ))
    // untouched columns keep their values; schema preserved
    assert(FluxCal.applyMultipliers(values, mults, Seq("flux")).columns.toSeq ==
      Seq("obs_id", "chan", "flux", "weight"))
  }
}
