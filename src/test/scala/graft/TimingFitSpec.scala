package graft

import org.apache.spark.sql.functions._

import graft.operators.TimingFit

/** Weighted normal-equations fit: planted coefficients must be recovered
  * by both the general driver solve and the Cramer-3 Column path; a
  * singular design must yield nulls/empties, not garbage. */
class TimingFitSpec extends SparkSpec {

  private def mkDf = {
    val s = spark
    import s.implicits._
    // y = 2 + 3·x1 − 0.5·x2 exactly, heteroskedastic weights
    (0 until 60).map { i =>
      val x1 = (i % 12).toDouble
      val x2 = x1 * x1
      val y = 2.0 + 3.0 * x1 - 0.5 * x2
      // dyadic weights: every per-row product stays exact through the
      // DECIMAL(38,6) moment cast, so recovery is double-precision-tight
      val w = 1.0 / (1L << (i % 4))
      (if (i % 2 == 0) "a" else "b", x1, x2, y, w)
    }.toDF("g", "x1", "x2", "y", "w")
  }

  test("general fit recovers planted coefficients per group") {
    val out = TimingFit.fit(mkDf, Seq("g"), col("y"), col("w"),
        Seq(lit(1.0), col("x1"), col("x2")))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    Seq("a", "b").foreach { g =>
      val betas = out(g)
      assert(betas.length === 3)
      assert(math.abs(betas(0) - 2.0) < 1e-7, s"$g beta0 ${betas(0)}")
      assert(math.abs(betas(1) - 3.0) < 1e-7, s"$g beta1 ${betas(1)}")
      assert(math.abs(betas(2) + 0.5) < 1e-7, s"$g beta2 ${betas(2)}")
    }
  }

  test("Cramer-3 Column path agrees with the driver solve") {
    val m = TimingFit.moments(mkDf, Seq("g"), col("y"), col("w"),
      Seq(lit(1.0), col("x1"), col("x2")))
    val cramer = TimingFit.solveCramer3(m)
      .select("g", "beta0", "beta1", "beta2")
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val driver = TimingFit.fit(mkDf, Seq("g"), col("y"), col("w"),
        Seq(lit(1.0), col("x1"), col("x2")))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    Seq("a", "b").foreach { g =>
      cramer(g).zip(driver(g)).foreach { case (c, d) =>
        assert(math.abs(c - d) < 1e-7, s"$g cramer=$c driver=$d")
      }
    }
  }

  test("singular design yields null betas, not garbage") {
    val s = spark
    import s.implicits._
    // x2 == x1: rank-deficient normal matrix
    val df = (0 until 20)
      .map(i => ("g", i.toDouble % 5, i.toDouble % 5, i.toDouble, 1.0))
      .toDF("g", "x1", "x2", "y", "w")
    val m = TimingFit.moments(df, Seq("g"), col("y"), col("w"),
      Seq(lit(1.0), col("x1"), col("x2")))
    val r = TimingFit.solveCramer3(m).select("beta0", "beta1", "beta2").head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    val betas = TimingFit.fit(df, Seq("g"), col("y"), col("w"),
      Seq(lit(1.0), col("x1"), col("x2"))).select("betas").head().getSeq[Double](0)
    assert(betas.isEmpty)
  }

  test("diagnostics3: exact fit shows ~zero chi2/wrms; closed form matches per-row residuals") {
    val s = spark
    import s.implicits._
    // perfect fit → chi2 within ulp of 0 (and wrms clamped, never NaN)
    val exact = TimingFit.diagnostics3(TimingFit.moments(mkDf, Seq("g"),
        col("y"), col("w"), Seq(lit(1.0), col("x1"), col("x2")), withY2 = true))
      .select("g", "chi2", "wrms", "chi2_red").collect()
    exact.foreach { r =>
      assert(math.abs(r.getDouble(1)) < 1e-6, s"chi2 ${r.getDouble(1)}")
      assert(!r.getDouble(2).isNaN && r.getDouble(2) < 1e-3)
    }
    // noisy fit → the closed-form chi2 (syy − βᵀb, zero extra passes)
    // must agree with an explicit Σ w·r² over residuals3's per-row path
    // ±1.5 alternating on x1/2 parity — group "a" sees only even x1 and
    // "b" only odd, so an x1-parity pattern would be a constant WITHIN
    // each group (absorbed by the intercept, chi2 = 0); this one is not
    // expressible by any quadratic over 6 distinct x1 values
    val noisy = mkDf.withColumn("y",
      col("y") + when(pmod(col("x1"), lit(4.0)) < 2.0, lit(1.5)).otherwise(lit(-1.5)))
    val xs = Seq(lit(1.0), col("x1"), col("x2"))
    val diag = TimingFit.diagnostics3(TimingFit.moments(noisy, Seq("g"),
        col("y"), col("w"), xs, withY2 = true))
      .select("g", "chi2", "wrms", "n").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    val perRow = TimingFit.residuals3(noisy, Seq("g"), col("y"), col("w"), xs)
      .groupBy("g")
      .agg(sum(col("w") * col("resid") * col("resid")).as("chi2"), sum("w").as("sw"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    Seq("a", "b").foreach { g =>
      val (chi2, wrms, n) = diag(g)
      assert(n === 30L)
      assert(chi2 > 0.1, s"$g chi2 should be well off zero, got $chi2")
      assert(math.abs(chi2 - perRow(g)._1) < 1e-6 * chi2,
        s"$g closed-form $chi2 vs per-row ${perRow(g)._1}")
      assert(math.abs(wrms - math.sqrt(chi2 / perRow(g)._2)) < 1e-9)
    }
  }

  test("residuals3: ~zero residuals on exact data; null in singular groups") {
    val s = spark
    import s.implicits._
    val xs = Seq(lit(1.0), col("x1"), col("x2"))
    val r = TimingFit.residuals3(mkDf, Seq("g"), col("y"), col("w"), xs)
      .agg(max(abs(col("resid")))).head().getDouble(0)
    assert(r < 1e-7, s"max |resid| $r")
    val singular = (0 until 10)
      .map(i => ("g", i.toDouble % 5, i.toDouble % 5, i.toDouble, 1.0))
      .toDF("g", "x1", "x2", "y", "w")
    val nulls = TimingFit.residuals3(singular, Seq("g"), col("y"), col("w"), xs)
    assert(nulls.count() === 10L)
    assert(nulls.filter(col("resid").isNotNull).count() === 0L)
  }

  test("solveDense solves a well-conditioned 4x4 system") {
    val a = Array(
      Array(4.0, 1.0, 0.0, 0.5),
      Array(1.0, 3.0, 1.0, 0.0),
      Array(0.0, 1.0, 5.0, 2.0),
      Array(0.5, 0.0, 2.0, 6.0))
    val x = Array(1.0, -2.0, 3.0, 0.25)
    val b = a.map(row => row.zip(x).map { case (u, v) => u * v }.sum)
    val got = TimingFit.solveDense(a, b).get
    x.zip(got).foreach { case (e, g) => assert(math.abs(e - g) < 1e-9) }
  }
}
