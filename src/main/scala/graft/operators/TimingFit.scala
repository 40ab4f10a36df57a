package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Num._

/** Weighted multi-parameter least-squares fitting — the reference's
  * timing-fit step (`tempo2_wrapper.sh`; README §5 runs tempo2 over the
  * TOAs the pipeline produces). q65's per-group OLS is the 1-covariate
  * case; this is the general weighted normal-equations form
  * `(Xᵀ W X) β = Xᵀ W y` over arbitrary design columns.
  *
  * Scale shape: ALL corpus-sized work is one decimal-exact moment
  * aggregation (map-side combining, one shuffle on the group keys) —
  * p(p+3)/2 + 1 sums per group, independent of row count. The solve
  * touches only the p×p moment table:
  *   - `solveCramer3` (p ≤ 3) stays in Column math — closed-form Cramer
  *     expansion, engine-mirrorable term by term, no driver round-trip
  *     (the q128 oracle path);
  *   - `fit` (general p) collects ONE ROW PER GROUP of p(p+3)/2 doubles
  *     and runs a partial-pivot Gaussian elimination on the driver —
  *     the same bounded-driver-state class as `Pca`'s Jacobi solve
  *     (state ∝ groups·p², never ∝ rows). Group count must be bounded
  *     (it is a GROUP BY key set, same contract as KMeans' k).
  *
  * Determinism: moments go through DECIMAL(38,6) (order-independent,
  * Num policy); the per-row products `w·xᵢ·xⱼ` and the Cramer expansion
  * are fixed-order IEEE double chains. Cross-engine BITWISE parity
  * additionally requires integer-valued per-row products (integer grids
  * for x, w and y): a fractional product's double→decimal rounding can
  * differ between Spark (shortest-repr) and an exact-binary engine at
  * the 6th decimal place, and downstream cancellations (χ² = syy − βᵀb)
  * amplify that wobble — see q128/q131/q133 for the grid recipe.
  */
object TimingFit {

  /** Weighted normal-equation moments per group: `s{i}{j}` = Σ w·xᵢ·xⱼ
    * (upper triangle, i ≤ j), `b{i}` = Σ w·xᵢ·y, `n` = row count. Pass
    * `lit(1.0)` as the first design column for an intercept. */
  def moments(df: DataFrame, groupCols: Seq[String], y: Column, w: Column,
              xs: Seq[Column], withY2: Boolean = false,
              integerGrid: Boolean = false): DataFrame = {
    require(xs.nonEmpty, "at least one design column required")
    val p = xs.length
    // integerGrid: per-row products are integer-valued doubles → sum in
    // scale-0 decimal so the final decimal→double conversion is a single
    // correct rounding in both engines (see Num.dsumInt)
    val sumF: Column => Column = if (integerGrid) dsumInt else dsum
    val aggs =
      (for { i <- 0 until p; j <- i until p } yield
        sumF(w * xs(i) * xs(j)).as(s"s$i$j")) ++
      (0 until p).map(i => sumF(w * xs(i) * y).as(s"b$i")) ++
      (if (withY2) Seq(sumF(w * y * y).as("syy")) else Seq.empty) :+
      count(lit(1)).as("n")
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Closed-form 3-parameter solve over a `moments` output (columns
    * s00…s22, b0…b2): appends `det` and `beta0`–`beta2` (null when the
    * normal matrix is singular, det = 0). The expansion is written once
    * here and mirrored verbatim in the q128 oracle — keep the
    * parenthesization if editing. */
  def solveCramer3(m: DataFrame): DataFrame = {
    val s00 = col("s00"); val s01 = col("s01"); val s02 = col("s02")
    val s11 = col("s11"); val s12 = col("s12"); val s22 = col("s22")
    val b0 = col("b0"); val b1 = col("b1"); val b2 = col("b2")
    val det =
      s00 * (s11 * s22 - s12 * s12) -
      s01 * (s01 * s22 - s12 * s02) +
      s02 * (s01 * s12 - s11 * s02)
    val d = col("det")
    def ratio(num: Column): Column =
      when(d === lit(0.0), lit(null).cast("double")).otherwise(num / d)
    m.withColumn("det", det)
      .withColumn("beta0", ratio(
        b0 * (s11 * s22 - s12 * s12) -
        s01 * (b1 * s22 - s12 * b2) +
        s02 * (b1 * s12 - s11 * b2)))
      .withColumn("beta1", ratio(
        s00 * (b1 * s22 - s12 * b2) -
        b0 * (s01 * s22 - s12 * s02) +
        s02 * (s01 * b2 - b1 * s02)))
      .withColumn("beta2", ratio(
        s00 * (s11 * b2 - b1 * s12) -
        s01 * (s01 * b2 - b1 * s02) +
        b0 * (s01 * s12 - s11 * s02)))
  }

  /** Goodness-of-fit diagnostics over a `solveCramer3` output whose
    * moments were built `withY2 = true` — the residual summary a timing
    * user reads off a tempo2 run, WITHOUT a second pass over the rows:
    *
    *   chi2 = Σ w·r² = syy − (β₀b₀ + β₁b₁ + β₂b₂)   (normal-equation
    *     identity — exact for the exact β; with the float β the result
    *     carries a second-order defect that is bitwise cross-engine ONLY
    *     when the moments themselves are bitwise cross-engine. That
    *     requires the caller to feed integer-valued per-row products
    *     (integer grids for x, w AND y — the q128/q131/q133 discipline)
    *     so every DECIMAL(38,6) cast is lossless; with fractional
    *     per-row values the two engines' double→decimal roundings can
    *     disagree at the 6th place and the cancellation amplifies that
    *     wobble — the measured cause of q131's round-9 hash failure),
    *   wrms = √(max(chi2, 0) / Σw)   (the weighted RMS residual; the
    *     clamp absorbs the ≤ulp-negative chi2 of a perfect fit),
    *   chi2_red = chi2 / (n − 3)      (null when n ≤ 3).
    *
    * All three are fixed-order double chains over the per-group moment
    * row — zero extra shuffles, zero extra scans; the corpus is touched
    * exactly once (by `moments`). Null betas (singular normal matrix)
    * null all three. */
  def diagnostics3(m: DataFrame): DataFrame = {
    val fitted = solveCramer3(m)
    val explained =
      col("beta0") * col("b0") + col("beta1") * col("b1") + col("beta2") * col("b2")
    fitted
      .withColumn("chi2",
        when(col("beta0").isNull, lit(null).cast("double"))
          .otherwise(col("syy") - explained))
      .withColumn("wrms",
        when(col("chi2").isNull, lit(null).cast("double"))
          .otherwise(sqrt(greatest(col("chi2"), lit(0.0)) / col("s00"))))
      .withColumn("chi2_red",
        when(col("chi2").isNull || col("n") <= lit(3L), lit(null).cast("double"))
          .otherwise(col("chi2") / (col("n") - lit(3L)).cast("double")))
  }

  /** Per-row weighted residuals against a per-group Cramer-3 fit: joins
    * the (small — one row per group key) beta table back and computes
    * `resid = y − (β₀x₀ + β₁x₁ + β₂x₂)` as a pure map stage. The beta
    * side is broadcast — group cardinality is a GROUP BY key set, same
    * boundedness contract as `fit`. Rows in singular groups get null. */
  def residuals3(df: DataFrame, groupCols: Seq[String], y: Column, w: Column,
                 xs: Seq[Column]): DataFrame = {
    require(xs.length == 3, "residuals3 is the p=3 closed-form path")
    // null-safe group join: groupBy keeps a null-keyed group, so rows of
    // that group must find their betas too — an equi-join's NULL != NULL
    // would silently drop them, shrinking downstream residual sums
    val betas = solveCramer3(moments(df, groupCols, y, w, xs))
      .select((groupCols.map(c => col(c).as(s"__g_$c")) ++
        Seq(col("beta0"), col("beta1"), col("beta2"))): _*)
    val cond = groupCols.map(c => df(c) <=> betas(s"__g_$c")).reduce(_ && _)
    val predicted =
      col("beta0") * xs(0) + col("beta1") * xs(1) + col("beta2") * xs(2)
    df.join(org.apache.spark.sql.functions.broadcast(betas), cond)
      .drop(groupCols.map(c => s"__g_$c"): _*)
      .withColumn("resid",
        when(col("beta0").isNull, lit(null).cast("double"))
          .otherwise(y - predicted))
  }

  /** General weighted fit: one row per group with `betas: array<double>`
    * (empty array when the normal matrix is singular) and `n`. Driver
    * state is groups · p(p+3)/2 doubles — bounded by the group-key
    * cardinality, not the data. */
  def fit(df: DataFrame, groupCols: Seq[String], y: Column, w: Column,
          xs: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val p = xs.length
    val m = moments(df, groupCols, y, w, xs)
    val g = groupCols.length
    val out = m.collect().map { r =>
      val a = Array.ofDim[Double](p, p)
      val b = Array.ofDim[Double](p)
      var idx = g
      for (i <- 0 until p; j <- i until p) {
        val v = if (r.isNullAt(idx)) 0.0 else r.getDouble(idx)
        a(i)(j) = v; a(j)(i) = v
        idx += 1
      }
      for (i <- 0 until p) {
        b(i) = if (r.isNullAt(idx)) 0.0 else r.getDouble(idx)
        idx += 1
      }
      val n = r.getLong(idx)
      Row.fromSeq(groupCols.indices.map(r.get) ++
        Seq(solveDense(a, b).map(_.toSeq).getOrElse(Seq.empty[Double]), n))
    }
    val schema = StructType(
      groupCols.map(c => m.schema(c)) ++ Seq(
        StructField("betas", ArrayType(DoubleType, containsNull = false)),
        StructField("n", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toIndexedSeq, math.max(1, math.min(out.length, 4))),
      schema)
  }

  /** In-place partial-pivot Gaussian elimination; None when singular. */
  private[graft] def solveDense(a0: Array[Array[Double]],
                                    b0: Array[Double]): Option[Array[Double]] = {
    val p = b0.length
    val a = a0.map(_.clone())
    val b = b0.clone()
    var col0 = 0
    while (col0 < p) {
      var piv = col0
      var best = math.abs(a(col0)(col0))
      var r = col0 + 1
      while (r < p) {
        val v = math.abs(a(r)(col0))
        if (v > best) { best = v; piv = r }
        r += 1
      }
      if (best == 0.0) return None
      if (piv != col0) {
        val tr = a(piv); a(piv) = a(col0); a(col0) = tr
        val tb = b(piv); b(piv) = b(col0); b(col0) = tb
      }
      r = col0 + 1
      while (r < p) {
        val f = a(r)(col0) / a(col0)(col0)
        if (f != 0.0) {
          var c = col0
          while (c < p) { a(r)(c) -= f * a(col0)(c); c += 1 }
          b(r) -= f * b(col0)
        }
        r += 1
      }
      col0 += 1
    }
    val x = Array.ofDim[Double](p)
    var i = p - 1
    while (i >= 0) {
      var s = b(i)
      var j = i + 1
      while (j < p) { s -= a(i)(j) * x(j); j += 1 }
      x(i) = s / a(i)(i)
      i -= 1
    }
    Some(x)
  }
}
