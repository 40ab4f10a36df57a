package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Signal-math column combinators — the engine-level form of meerpipe's
  * per-observation arithmetic. All are plain `Column` expressions so they
  * stay inside whole-stage codegen.
  */
object Signal {

  /** A value band: classification range [low, high) plus the inner
    * [keepLow, keepHigh] range that survives edge-chopping.
    * Value-space analog of the frequency band tables in
    * `archive_utils.get_band` (archive_utils.py:22) and
    * `chopping_utility` (archive_utils.py:140). */
  final case class Band(name: String, low: Double, high: Double, keepLow: Double, keepHigh: Double)

  val defaultBands: Seq[Band] = Seq(
    Band("UHF",     0.0,  50.0,   5.0,  45.0),
    Band("LBAND",  50.0, 150.0,  60.0, 140.0),
    Band("SBAND_0", 150.0, 250.0, 160.0, 240.0),
    Band("SBAND_1", 250.0, 350.0, 260.0, 340.0),
    Band("SBAND_2", 350.0, 500.0, 360.0, 480.0),
  )

  /** Conditional range-bucketing: map a value to its band name
    * (`get_band`, archive_utils.py:22). Pure when-chain → codegen'd. */
  def bandOf(v: Column, bands: Seq[Band] = defaultBands): Column =
    bands.foldLeft(Option.empty[Column]) { (acc, b) =>
      val cond = v >= b.low && v < b.high
      Some(acc.fold(when(cond, b.name))(_.when(cond, b.name)))
    }.get.otherwise("UNKNOWN")

  /** True when the value survives its band's edge-chop range
    * (`chopping_utility`, archive_utils.py:140). */
  def insideChop(v: Column, bands: Seq[Band] = defaultBands): Column =
    bands.map(b => v >= b.keepLow && v <= b.keepHigh && v >= b.low && v < b.high)
      .reduce(_ || _)

  /** Per-array system-equivalent flux density: (SEFD + Tsky_Jy) / Nant
    * (`get_Ssys`, scripts/fluxcal_meerkat.py:258). */
  def ssys(sefdJy: Column, tskyJy: Column, nant: Column): Column =
    (sefdJy + tskyJy) / nant

  /** Radiometer-equation expected RMS: ssys / sqrt(2*bw/nchan * tobs/nbin)
    * (`get_expectedRMS`, scripts/fluxcal_meerkat.py:278). */
  def radiometerRms(ssys: Column, bw: Column, nchan: Column, tobs: Column, nbin: Column): Column =
    ssys / sqrt(lit(2.0) * bw / nchan * tobs / nbin)

  /** S/N-driven max subintegration count
    * (`calc_max_nsub`, calc_max_nsub.py:4). */
  def maxNsub(sn: Column, nchan: Column, duration: Column, inputNsub: Column,
              snDesired: Double = 12.0, minimumDuration: Double = 480.0): Column = {
    val snChan = sn / sqrt(nchan)
    val estimated = greatest(duration * pow(lit(snDesired) / snChan, 2.0), lit(minimumDuration))
    least(floor(duration / estimated), inputNsub)
  }

  /** Aggregate: fraction of rows matching a zap predicate
    * (`calc_dynspec_zap_fraction`, archive_utils.py:118).
    * Integer-counting form — exact and order-independent. */
  def zapFraction(cond: Column): Column =
    (sum(cond.cast("long")).cast("double") / count(lit(1))).cast("double")

  // -------------------------------------------------------------------
  // Stokes profile alignment (scripts/make_stokes_movie.py) — per-row
  // array math over a binned profile column. HOF lambdas (transform /
  // zip_with) run interpreted, but the arrays are nbin-sized (10²-10³)
  // per row, so the cost rides the row count, not the corpus bytes; the
  // shuffle-level work (the profile binning itself) stays codegen'd.
  // -------------------------------------------------------------------

  /** Left-rotation count (in [0, n)) that puts the profile's FIRST argmax
    * at the phase-0.5 bin — `prof.find_max_phase() - 0.5` followed by
    * `rotate_phase` (make_stokes_movie.py:21-23), in bin space. */
  def alignShift(arr: Column): Column = {
    val n = size(arr).cast("long")
    val k = array_position(arr, array_max(arr)) // 1-based first argmax
    val tgt = floor(n / lit(2L)).cast("long") + lit(1L) // 1-based phase-0.5 bin
    pmod(k - tgt, n)
  }

  /** Circularly left-rotate a profile by `s` bins (s in [0, size)). */
  def rotateProfile(arr: Column, s: Column): Column = {
    val si = s.cast("int")
    concat(slice(arr, si + lit(1), size(arr) - si), slice(arr, lit(1), si))
  }

  /** Min-max normalize a profile (`normalise_profile`,
    * make_stokes_movie.py:28-30); a flat profile (max == min) maps to
    * all-zero instead of dividing by zero. */
  def minMaxNormalize(arr: Column): Column = {
    val mn = array_min(arr)
    val mx = array_max(arr)
    transform(arr, x => when(mx === mn, lit(0.0)).otherwise((x - mn) / (mx - mn)))
  }

  /** Linear-polarization profile √(Q²+U²) (make_stokes_movie.py:50). */
  def linearPol(q: Column, u: Column): Column =
    zip_with(q, u, (a, b) => sqrt(a * a + b * b))

  /** Scale every bin by 1/m — the `profile / noramlise_by` step
    * (make_stokes_movie.py:48-51). */
  def scaleProfile(arr: Column, m: Column): Column =
    transform(arr, _ / m)
}
