package graft

import org.apache.spark.sql.functions._

import graft.expressions.{KeplerMath, KeplerSolve}
import graft.functions.Orbital

class OrbitalSpec extends SparkSpec {
  import spark.implicits._

  test("KeplerMath.solve inverts Kepler's equation") {
    for (ecc <- Seq(0.1, 0.5, 0.9); m <- Seq(0.3, 1.7, 4.0, 6.1)) {
      val e = KeplerMath.solve(m, ecc)
      assert(math.abs(e - ecc * math.sin(e) - m) < 1e-10, s"ecc=$ecc m=$m")
    }
  }

  test("KeplerMath.solve short-circuits to circular below 1e-4 (binary_tools.py:232)") {
    assert(KeplerMath.solve(1.234, 5e-5) == 1.234)
  }

  test("kepler_solve expression works in SQL with codegen") {
    KeplerSolve.register(spark)
    val df = Seq((1.5, 0.3), (4.0, 0.7)).toDF("m", "ecc")
      .selectExpr("m", "ecc", "kepler_solve(m, ecc) AS e")
    df.collect().foreach { r =>
      val (m, ecc, e) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      assert(math.abs(e - ecc * math.sin(e) - m) < 1e-10)
    }
  }

  test("trueAnomaly is continuous across orbits and in [M-range]") {
    // circular limit: U == E == M
    assert(math.abs(KeplerMath.trueAnomaly(2.5, 0.0) - 2.5) < 1e-12)
    // monotone rescale: for E just past 2π the orbit count carries over
    val u = KeplerMath.trueAnomaly(2.0 * math.Pi + 0.1, 0.2)
    assert(u > 2.0 * math.Pi)
  }

  test("binPhase stays in [0,1) and matches circular closed form at ecc=0") {
    for (m <- Seq(0.0, 1.0, 5.0, 12.6)) {
      val p = KeplerMath.binPhase(m, 0.0, 0.0, 0.0, 1.0)
      val want = (m / (2 * math.Pi)) % 1.0
      assert(p >= 0.0 && p < 1.0)
      assert(math.abs(p - want) < 1e-12, s"m=$m got=$p want=$want")
    }
  }

  test("ell1Arctan resolves tan degeneracies into [0,2pi) (binary_tools.py:93)") {
    assert(Orbital.ell1Arctan(0.0, 0.0) == 0.0)                       // zero ecc: undefined -> 0
    assert(Orbital.ell1Arctan(1.0, 0.0) == math.Pi / 2)               // EPS2=0, EPS1>0
    assert(Orbital.ell1Arctan(-1.0, 0.0) == 3 * math.Pi / 2)          // EPS2=0, EPS1<0 -> wrapped
    val a = Orbital.ell1Arctan(1.0, -1.0)                             // EPS2<0: +pi branch
    assert(math.abs(a - (math.Pi - math.Pi / 4)) < 1e-12)
    val b = Orbital.ell1Arctan(1.0, 1.0)
    assert(math.abs(b - math.Pi / 4) < 1e-12)
  }

  test("t0FromTasc shifts by arctan/OMB (binary_tools.py:180)") {
    val t0 = Orbital.t0FromTasc(60000.0, 1.0, 1.0, pbDays = 2.0)
    assert(math.abs(t0 - (60000.0 + (math.Pi / 4) / (math.Pi))) < 1e-12)
  }

  test("t0FromTasc uses the FB-based OMB for TASC+FB ephemerides (get_OMB, binary_tools.py:148)") {
    // FB0 corresponding to PB ≈ 2 days, but deliberately NOT exactly
    // 1/(86400·2): the FB-based OMB must win over any PB field.
    val fb0 = 1.0 / (86400.0 * 1.9)
    val pars = Orbital.BinaryPars(pbDays = 2.0, t0Mjd = 0.0, ecc = 0.0, fb = Seq(fb0))
    val t0 = Orbital.t0FromTasc(60000.0, 1.0, 1.0, pars)
    val expected = 60000.0 + (math.Pi / 4) / (2.0 * math.Pi * fb0 * 86400.0)
    assert(math.abs(t0 - expected) < 1e-12)
    // and the PB-only overload still matches the old closed form
    assert(math.abs(Orbital.t0FromTasc(60000.0, 1.0, 1.0, pbDays = 1.9) - expected) < 1e-12)
  }

  test("FB0-Taylor mean anomaly matches the reference series (binary_tools.py:221)") {
    // FB-parameterized black-widow-style ephemeris: FB0 in Hz + two
    // higher-order terms. Reference: M = 2π·86400·Σ FBᵢ·dt^(i+1)/(i+1)!
    val fb = Seq(7.5e-5, 1.2e-14, -3.0e-22)
    val pars = Orbital.BinaryPars(pbDays = 0.0, t0Mjd = 60000.0, ecc = 0.0, fb = fb)
    def refM(dt: Double): Double = {
      def fact(n: Int): Double = (1 to n).product.toDouble
      2.0 * math.Pi * 86400.0 *
        fb.zipWithIndex.map { case (f, i) => f * math.pow(dt, i + 1) / fact(i + 1) }.sum
    }
    val dts = Seq(-3.7, 0.0, 0.4, 12.9, 400.0)
    val got = dts.toDF("dt").select(Orbital.meanAnomaly(col("dt"), pars).as("m"))
      .as[Double].collect().toSeq
    dts.zip(got).foreach { case (dt, m) =>
      assert(math.abs(m - refM(dt)) <= 1e-12 * math.max(1.0, math.abs(refM(dt))), s"dt=$dt")
    }
    // OMB for FB ephemerides is 2π·FB0·86400 rad/day (get_OMB, binary_tools.py:156)
    assert(math.abs(Orbital.ombRadPerDay(pars) - 2.0 * math.Pi * 7.5e-5 * 86400.0) < 1e-12)
  }

  test("PBDOT in tempo format auto-corrects by 1e-12 (binary_tools.py:216)") {
    val raw = Orbital.BinaryPars(pbDays = 2.0, t0Mjd = 60000.0, ecc = 0.0, pbdot = 1.5e-12)
    val tempo = raw.copy(pbdot = 1.5) // tempo files carry PBDOT×1e12
    val df = Seq(10.0).toDF("dt")
    val m1 = df.select(Orbital.meanAnomaly(col("dt"), raw)).as[Double].head()
    val m2 = df.select(Orbital.meanAnomaly(col("dt"), tempo)).as[Double].head()
    assert(m1 == m2)
    val omb = 2.0 * math.Pi / 2.0
    val want = omb * (10.0 - 0.5 * (1.5e-12 / 2.0) * 100.0)
    assert(math.abs(m1 - want) < 1e-12)
  }

  test("binPhase with FB parameters stays in [0,1) and matches the PB form when equivalent") {
    val ts = java.sql.Timestamp.valueOf("2024-01-05 12:00:00")
    val pb = 0.1025
    val fbEquiv = 1.0 / (pb * 86400.0) // FB0 = 1/PB_seconds
    KeplerSolve.register(spark)
    val df = Seq(ts).toDF("ts")
    val pPb = df.select(Orbital.binPhase(col("ts"),
      Orbital.BinaryPars(pb, 60000.0, 0.3)).as("p")).as[Double].head()
    val pFb = df.select(Orbital.binPhase(col("ts"),
      Orbital.BinaryPars(0.0, 60000.0, 0.3, fb = Seq(fbEquiv))).as("p")).as[Double].head()
    assert(pPb >= 0.0 && pPb < 1.0)
    // same physical ephemeris → same phase up to double rounding of 2πFB0·86400 vs 2π/PB
    assert(math.abs(pFb - pPb) < 1e-6)
  }

  test("circularPhase column matches scalar computation") {
    val ts = java.sql.Timestamp.valueOf("2024-01-05 12:00:00")
    val df = Seq(ts).toDF("ts")
      .withColumn("phase", Orbital.circularPhase(col("ts"), pbDays = 0.25, t0Mjd = 60000.0))
    val got = df.select("phase").as[Double].head()
    val mjd = ts.getTime / 86400000.0 + 40587.0
    val orbits = (mjd - 60000.0) / 0.25
    assert(math.abs(got - (orbits - math.floor(orbits))) < 1e-9)
  }
}
