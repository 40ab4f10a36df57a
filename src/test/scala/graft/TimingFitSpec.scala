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
