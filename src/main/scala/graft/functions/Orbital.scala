package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Orbital/binary-phase column math — engine-level form of
  * `binary_tools.get_binphase` (binary_tools.py:76) and helpers.
  *
  * The circular-orbit path is closed-form and stays in codegen'd builtins;
  * the eccentric path (Kepler's equation) lives in the native
  * `KeplerSolve` Catalyst expression (graft.expressions).
  */
object Orbital {

  /** Unix epoch day 0 as Modified Julian Date. */
  val UnixEpochMjd = 40587.0

  /** Timestamp → MJD (UTC), double. */
  def mjd(ts: Column): Column =
    unix_micros(ts) / lit(86400000000.0) + lit(UnixEpochMjd)

  /** Mean anomaly in orbits for a circular orbit: (mjd - T0) / PB
    * (`get_mean_anomaly`, binary_tools.py:196 with PBDOT = 0). */
  def meanOrbits(mjdCol: Column, pbDays: Double, t0Mjd: Double): Column =
    (mjdCol - lit(t0Mjd)) / lit(pbDays)

  /** Binary phase in [0, 1) for a circular orbit
    * (`get_binphase`, binary_tools.py:76 with ECC = 0, OM = 0). */
  def circularPhase(ts: Column, pbDays: Double, t0Mjd: Double): Column = {
    val orbits = meanOrbits(mjd(ts), pbDays, t0Mjd)
    orbits - floor(orbits)
  }

  /** ELL1 eccentricity from EPS1/EPS2 (`get_ecc`, binary_tools.py:160). */
  def eccEll1(eps1: Column, eps2: Column): Column =
    sqrt(eps1 * eps1 + eps2 * eps2)

  /** arctan(EPS1/EPS2) with all ELL1 degeneracies resolved, in [0, 2π)
    * (`get_ELL1_arctan`, binary_tools.py:93). Scalar: used to convert
    * (TASC, EPS1, EPS2) parameter sets to (T0, OM, ECC). */
  def ell1Arctan(eps1: Double, eps2: Double): Double = {
    val at =
      if (eps2 == 0.0) {
        if (eps1 > 0) math.Pi / 2 else if (eps1 < 0) -math.Pi / 2 else 0.0
      } else {
        val a = math.atan(eps1 / eps2)
        if (eps2 < 0) a + math.Pi else a
      }
    ((at % (2 * math.Pi)) + 2 * math.Pi) % (2 * math.Pi)
  }

  /** T0 from an ELL1 (TASC, EPS1, EPS2) parameterization
    * (`get_T0`, binary_tools.py:180): TASC + arctan/OMB. OMB comes from
    * the full parameter set (`get_OMB`, binary_tools.py:148), so a
    * TASC+FB ephemeris converts with the FB-based orbital frequency —
    * not the 2π/PB shortcut, which is subtly wrong when PB is merely the
    * derived 1/(86400·FB0) rounded in the par file. */
  def t0FromTasc(tascMjd: Double, eps1: Double, eps2: Double, pars: BinaryPars): Double =
    tascMjd + ell1Arctan(eps1, eps2) / ombRadPerDay(pars)

  /** Convenience overload for PB-only ephemerides (OMB = 2π/PB). */
  def t0FromTasc(tascMjd: Double, eps1: Double, eps2: Double, pbDays: Double): Double =
    t0FromTasc(tascMjd, eps1, eps2, BinaryPars(pbDays = pbDays, t0Mjd = 0.0, ecc = 0.0))

  /** Binary-model parameters (BT-style subset; ELL1 callers convert via
    * eccEll1/TASC first, as `get_T0` does, binary_tools.py:180).
    *
    * `fb` non-empty selects the orbital-frequency (FB0, FB1, …)
    * parameterization instead of PB/PBDOT — common for black-widow
    * systems; FB0 in Hz, higher terms as in the par file. */
  final case class BinaryPars(
      pbDays: Double,
      t0Mjd: Double,
      ecc: Double,
      om0Rad: Double = 0.0,
      omdotDegPerYear: Double = 0.0,
      pbdot: Double = 0.0,
      fb: Seq[Double] = Nil,
  )

  /** Constant orbital angular frequency in rad/day (`get_OMB`,
    * binary_tools.py:148): 2π/PB, or 2π·FB0·86400 for FB ephemerides. */
  def ombRadPerDay(pars: BinaryPars): Double =
    if (pars.fb.nonEmpty) 2.0 * math.Pi * pars.fb.head * 86400.0
    else 2.0 * math.Pi / pars.pbDays

  /** Mean anomaly (radians) from days-since-T0 (`get_mean_anomaly`,
    * binary_tools.py:195).
    *
    * PB branch: OMB·(dt − ½(PBDOT/PB)·dt²), with the reference's
    * tempo-format auto-correction (|PBDOT| > 1e-6 → ×1e-12,
    * binary_tools.py:216).
    *
    * FB branch: 2π·86400·Σᵢ FBᵢ·dt^(i+1)/(i+1)! — the integrated Taylor
    * series of the orbital frequency (binary_tools.py:221-232). Note the
    * single ×86400 over the whole series mirrors the reference EXACTLY,
    * including for i ≥ 1 where a dimensionally-strict form would scale
    * each term by 86400^(i+1); parity with the reference's numbers is the
    * contract here, so the quirk is reproduced, not "fixed". */
  def meanAnomaly(dtDays: Column, pars: BinaryPars): Column =
    if (pars.fb.nonEmpty) {
      val series = pars.fb.zipWithIndex.map { case (fbi, i) =>
        var fact = 1.0
        (2 to i + 1).foreach(k => fact *= k)
        lit(fbi / fact) * pow(dtDays, lit(i + 1.0))
      }.reduce(_ + _)
      series * lit(2.0 * math.Pi * 86400.0)
    } else {
      val pbdot = if (math.abs(pars.pbdot) > 1e-6) pars.pbdot * 1e-12 else pars.pbdot
      lit(ombRadPerDay(pars)) * (dtDays - lit(0.5 * pbdot / pars.pbDays) * dtDays * dtDays)
    }

  /** Full distributed binary phase — the Column form of
    * `get_binphase` (binary_tools.py:76): mean anomaly (PB/PBDOT or
    * FB0-Taylor, binary_tools.py:195) → Kepler solve (native KeplerSolve
    * expression) → true anomaly (binary_tools.py:252) → instantaneous
    * omega with OMDOT (binary_tools.py:113) → phase in [0,1).
    *
    * Requires `KeplerSolve.register(spark)` (or GraftExtensions) so the
    * solver is available; everything else is codegen'd builtins.
    */
  def binPhase(ts: Column, pars: BinaryPars): Column = {
    import org.apache.spark.sql.functions.expr
    val twoPi = 2.0 * math.Pi
    val omb = ombRadPerDay(pars)
    val dt = mjd(ts) - lit(pars.t0Mjd)
    val m = meanAnomaly(dt, pars)
    val e = call_kepler(m, pars.ecc)
    // true anomaly, rescaled to count whole orbits
    val u0 = lit(2.0) * atan2(
      sqrt(lit(1.0 + pars.ecc)) * sin(e / 2.0),
      sqrt(lit(1.0 - pars.ecc)) * cos(e / 2.0))
    val uPos = when(u0 < 0.0, u0 + twoPi).otherwise(u0)
    val u = uPos + floor(e / twoPi) * twoPi
    val omdotRadPerDay = pars.omdotDegPerYear * (math.Pi / 180.0) / 365.25
    val om = lit(pars.om0Rad) + lit(omdotRadPerDay) * u / omb
    val uNorm = u % twoPi
    ((uNorm + om + twoPi) % twoPi / twoPi + 1.0) % 1.0
  }

  private def call_kepler(m: Column, ecc: Double): Column = {
    import org.apache.spark.sql.functions.call_function
    call_function("kepler_solve", m, org.apache.spark.sql.functions.lit(ecc))
  }
}
