package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sky-coordinate column math — the engine-level form of the coordinate
  * handling meerpipe shells out for (`get_glgb` via psrcat,
  * scripts/fluxcal_meerkat.py:61; RAJ/DECJ sexagesimal parsing and frame
  * conversion via astropy SkyCoord, fluxcal_meerkat.py:91-145). All pure
  * per-row expressions: no UDFs, no shuffle, stays in whole-stage codegen.
  *
  * The equatorial→galactic rotation uses the standard IAU J2000 frame
  * constants (public: e.g. Perryman et al. 1997, ESA Hipparcos vol. 1
  * §1.5): NGP at (192.85948°, +27.12825°), node angle 122.93192°.
  */
object Coords {

  /** J2000 right ascension of the north galactic pole, degrees. */
  val RaNgpDeg = 192.85948
  /** J2000 declination of the north galactic pole, degrees. */
  val DecNgpDeg = 27.12825
  /** Galactic longitude of the north celestial pole, degrees. */
  val LNcpDeg = 122.93192

  private val D2R = math.Pi / 180.0

  /** Galactic latitude (degrees) from J2000 RA/DEC in degrees. */
  def gbDeg(raDeg: Column, decDeg: Column): Column = {
    val ra = raDeg * lit(D2R)
    val dec = decDeg * lit(D2R)
    val sinB = sin(dec) * lit(math.sin(DecNgpDeg * D2R)) +
      cos(dec) * lit(math.cos(DecNgpDeg * D2R)) * cos(ra - lit(RaNgpDeg * D2R))
    asin(sinB) / lit(D2R)
  }

  /** Galactic longitude (degrees, [0, 360)) from J2000 RA/DEC in degrees. */
  def glDeg(raDeg: Column, decDeg: Column): Column = {
    val ra = raDeg * lit(D2R)
    val dec = decDeg * lit(D2R)
    val dra = ra - lit(RaNgpDeg * D2R)
    val y = cos(dec) * sin(dra)
    val x = sin(dec) * lit(math.cos(DecNgpDeg * D2R)) -
      cos(dec) * lit(math.sin(DecNgpDeg * D2R)) * cos(dra)
    val l = lit(LNcpDeg) - atan2(y, x) / lit(D2R)
    ((l % 360.0) + 360.0) % 360.0
  }

  /** RA in degrees from a sexagesimal hour-angle string "hh:mm:ss.s"
    * (astropy Longitude(..., unit='hourangle') parity for the par-file
    * RAJ field, fluxcal_meerkat.py:104). Missing components count as 0. */
  def raFromHms(s: Column): Column = {
    val p = split(s, ":")
    val h = coalesce(try_element_at(p, lit(1)).cast("double"), lit(0.0))
    val m = coalesce(try_element_at(p, lit(2)).cast("double"), lit(0.0))
    val sec = coalesce(try_element_at(p, lit(3)).cast("double"), lit(0.0))
    (h + m / 60.0 + sec / 3600.0) * 15.0
  }

  /** DEC in degrees from a sexagesimal string "±dd:mm:ss.s" (astropy
    * Latitude(..., unit='deg') parity for the par-file DECJ field). The
    * sign applies to the whole value, so "-00:30:00" is −0.5°. */
  def decFromDms(s: Column): Column = {
    val neg = s.startsWith("-")
    val body = when(neg || s.startsWith("+"), substring(s, 2, 1000)).otherwise(s)
    val p = split(body, ":")
    val d = coalesce(try_element_at(p, lit(1)).cast("double"), lit(0.0))
    val m = coalesce(try_element_at(p, lit(2)).cast("double"), lit(0.0))
    val sec = coalesce(try_element_at(p, lit(3)).cast("double"), lit(0.0))
    val mag = d + m / 60.0 + sec / 3600.0
    when(neg, -mag).otherwise(mag)
  }
}
