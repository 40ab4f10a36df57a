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
}
