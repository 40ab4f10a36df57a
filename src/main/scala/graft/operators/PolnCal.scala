package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Polarisation calibration — the reference pipeline's FIRST named
  * routine (`/root/reference/README.md` Functionalities §1: per-channel
  * Jones matrices supplied by the observatory are applied to every
  * observation; the reference's own Python shells the math out to
  * psrchive `pac`, so this operator is the engine-native analog of that
  * routine, following the public conventions of van Straten 2004 /
  * Serylak et al. 2020, arXiv:2009.05797).
  *
  * Model: in the linear receptor basis the coherency matrix of a
  * (I, Q, U, V) Stokes sample is
  *
  *   ρ = ½ · [ I+Q   U+iV ]
  *           [ U−iV  I−Q  ]
  *
  * and the instrument distorts it as ρ_meas = J ρ_true J^H. Calibration
  * conjugates by the inverse: ρ_true = J⁻¹ ρ_meas (J⁻¹)^H, then maps
  * back to Stokes — I = ρ00+ρ11, Q = ρ00−ρ11, U = ρ01+ρ10,
  * V = −i(ρ01−ρ10), all real because ρ stays Hermitian under any
  * invertible J.
  *
  * Spark shape: the calibration table is tiny (one row per channel —
  * kHz-scale channel counts, 8 real Jones components each), so it
  * BROADCASTS and the whole correction is ONE projection of unrolled
  * complex-as-real arithmetic over the fact table: scan-fused,
  * whole-stage-codegen'd, zero shuffles at any data size. No UDF — the
  * 2×2 complex sandwich expands to plain column expressions the
  * optimizer can see through.
  */
object PolnCal {

  /** A complex number as a (re, im) column pair. */
  private final case class Cx(re: Column, im: Column) {
    def +(o: Cx): Cx = Cx(re + o.re, im + o.im)
    def -(o: Cx): Cx = Cx(re - o.re, im - o.im)
    def *(o: Cx): Cx = Cx(re * o.re - im * o.im, re * o.im + im * o.re)
    def conj: Cx = Cx(re, -im)
    def /(o: Cx): Cx = {
      val d = o.re * o.re + o.im * o.im
      Cx((re * o.re + im * o.im) / d, (im * o.re - re * o.im) / d)
    }
  }
  private def cx(re: Column): Cx = Cx(re, lit(0.0))

  /** The 8 Jones component column names for `prefix`:
    * `{prefix}00_re, {prefix}00_im, …, {prefix}11_im` (row-major 2×2). */
  def jonesColumns(prefix: String = "j"): Seq[String] =
    for (rc <- Seq("00", "01", "10", "11"); p <- Seq("_re", "_im"))
      yield s"$prefix$rc$p"

  /** Apply per-key Jones calibration to Stokes columns.
    *
    * `jones` holds `keys` plus the 8 real components ([[jonesColumns]]);
    * it is broadcast. With `invert = true` (the `pac` direction) the
    * matrix is inverted per row before the conjugation — a 2×2 complex
    * inverse is closed-form (adjugate over determinant), still plain
    * column math. `invert = false` applies J forward, which SIMULATES an
    * instrumental distortion — the spec's round-trip uses it.
    *
    * Output: the input rows with four new columns
    * `{i,q,u,v}Col + outSuffix`. Null Stokes inputs (a masked channel)
    * propagate to null calibrated values; a non-matching key leaves the
    * row with null calibration (left join) rather than dropping it; a
    * SINGULAR Jones matrix under `invert = true` (a dead receptor) also
    * yields null calibrated values instead of silent NaN/Infinity — in
    * all three cases the caller decides whether missing calibration is
    * fatal.
    *
    * `singularEps2` is the |det|² threshold for "singular". The default
    * 0.0 nulls EXACTLY det = 0 (bitwise-mirrorable, the q121 oracle
    * semantics); a NEAR-singular matrix (det ~ 1e-300) then passes and
    * produces huge/±Inf calibrated values — if near-singular
    * observatory tables are plausible, set e.g. `singularEps2 = 1e-24`
    * (|det| ≲ 1e-12) to null them too. The guard runs on the broadcast
    * calibration table (a handful of rows), never the hot projection. */
  def applyJones(df: DataFrame, jones: DataFrame, keys: Seq[String],
                 iCol: String = "stokes_i", qCol: String = "stokes_q",
                 uCol: String = "stokes_u", vCol: String = "stokes_v",
                 prefix: String = "j", invert: Boolean = true,
                 outSuffix: String = "_cal",
                 singularEps2: Double = 0.0): DataFrame = {
    require(keys.nonEmpty, "applyJones: at least one join key")
    val need = keys ++ jonesColumns(prefix)
    need.foreach(c => require(jones.columns.contains(c),
      s"applyJones: jones table is missing column $c"))

    // A SINGULAR matrix (det = 0 — a dead receptor row) has no inverse:
    // null out its 8 components ON THE CALIBRATION TABLE (per channel,
    // a handful of rows) so nulls propagate through the per-row algebra
    // for free. Guarding inside the big projection instead (when(d=0,
    // null).otherwise(...)) disables Catalyst subexpression elimination
    // across the conditional and measured 0.9 → 4.3 s on the sf0.1 run.
    val cleanJones =
      if (!invert) jones.select(need.map(col): _*)
      else {
        val jc = jonesColumns(prefix)
        def c(rc: String, p: String) = col(s"$prefix$rc$p")
        val detRe = c("00", "_re") * c("11", "_re") - c("00", "_im") * c("11", "_im") -
          (c("01", "_re") * c("10", "_re") - c("01", "_im") * c("10", "_im"))
        val detIm = c("00", "_re") * c("11", "_im") + c("00", "_im") * c("11", "_re") -
          (c("01", "_re") * c("10", "_im") + c("01", "_im") * c("10", "_re"))
        // |det|² is a sum of squares (≥ 0), so <= 0.0 is exactly the
        // det = 0 test when singularEps2 is the 0.0 default
        val singular = (detRe * detRe + detIm * detIm) <= lit(singularEps2)
        jones.select(keys.map(col) ++ jc.map(n =>
          when(singular, lit(null).cast("double")).otherwise(col(n)).as(n)): _*)
      }
    val joined = df.join(broadcast(cleanJones), keys, "left")

    val j00 = Cx(col(s"${prefix}00_re"), col(s"${prefix}00_im"))
    val j01 = Cx(col(s"${prefix}01_re"), col(s"${prefix}01_im"))
    val j10 = Cx(col(s"${prefix}10_re"), col(s"${prefix}10_im"))
    val j11 = Cx(col(s"${prefix}11_re"), col(s"${prefix}11_im"))

    // M = J⁻¹ (calibrate; singular rows arrive pre-nulled from
    // cleanJones, and null propagates) or J (simulate)
    val (m00, m01, m10, m11) =
      if (invert) {
        val det = j00 * j11 - j01 * j10
        (j11 / det, Cx(-j01.re, -j01.im) / det,
          Cx(-j10.re, -j10.im) / det, j00 / det)
      } else (j00, j01, j10, j11)

    val half = lit(0.5)
    val i = col(iCol).cast("double")
    val q = col(qCol).cast("double")
    val u = col(uCol).cast("double")
    val v = col(vCol).cast("double")
    val r00 = cx(half * (i + q))
    val r01 = Cx(half * u, half * v)
    val r10 = Cx(half * u, -half * v)
    val r11 = cx(half * (i - q))

    // T = M ρ ; ρ' = T M^H
    val t00 = m00 * r00 + m01 * r10
    val t01 = m00 * r01 + m01 * r11
    val t10 = m10 * r00 + m11 * r10
    val t11 = m10 * r01 + m11 * r11
    val p00 = t00 * m00.conj + t01 * m01.conj
    val p01 = t00 * m10.conj + t01 * m11.conj
    val p10 = t10 * m00.conj + t11 * m01.conj
    val p11 = t10 * m10.conj + t11 * m11.conj

    joined
      .withColumn(iCol + outSuffix, p00.re + p11.re)
      .withColumn(qCol + outSuffix, p00.re - p11.re)
      .withColumn(uCol + outSuffix, p01.re + p10.re)
      .withColumn(vCol + outSuffix, p01.im - p10.im)
      .drop(jonesColumns(prefix): _*)
  }
}
