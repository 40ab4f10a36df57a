package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust outlier flagging (μ ± kσ sigma-clipping) — the engine-level form
  * of MeerGuard's RFI excision (per-channel statistics → zap outliers).
  *
  * Moments are computed with exact decimal sums over an unordered per-group
  * window (one shuffle, no join), so flags are deterministic across engines
  * and partitionings.
  */
object Outliers {

  /** Adds `grp_mean`, `grp_std`, `is_outlier` columns. */
  def sigmaClip(df: DataFrame, groupCols: Seq[String], valueCol: String, k: Double): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
    val v = col(valueCol)
    val n = count(v).over(w).cast("double")
    val s = sum(v.cast("decimal(38,6)")).over(w).cast("double")
    val s2 = sum((v * v).cast("decimal(38,6)")).over(w).cast("double")
    val mean = s / n
    val std = sqrt((s2 / n) - (s / n) * (s / n))
    df.withColumn("grp_mean", mean)
      .withColumn("grp_std", std)
      .withColumn("is_outlier", abs(v - col("grp_mean")) > lit(k) * col("grp_std"))
  }

  /** Exact-element per-group median of `v` (rank = ceil(n/2) under
    * (v, tiebreak) ordering — the cross-engine-exact convention, no
    * interpolation), attached to every row as `alias`. One ranked
    * window + one broadcast-back join on the group key. */
  private def withMedian(df: DataFrame, groupCols: Seq[String], v: Column,
                         tiebreak: Column, alias: String): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(v, tiebreak)
    val cw = Window.partitionBy(groupCols.map(col): _*)
    // median over NON-NULL values only: ranking nulls (Spark sorts them
    // FIRST, DuckDB LAST) while counting them in n would both break
    // cross-engine parity and shift the rank off the true median
    val med = df
      .filter(v.isNotNull)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(cw))
      .groupBy(groupCols.map(col): _*)
      .agg(max(when(col("__rn") === ceil(col("__cnt") * 0.5), v)).as(alias))
    df.join(med, groupCols, "left")
  }

  /** MAD clipping — the robust twin of [[sigmaClip]]: flag rows where
    * |v − median| > k · MAD, MAD = median(|v − median|). Median/MAD
    * resist the exact failure mode μ/σ clipping has on RFI-like data: a
    * handful of huge spikes inflate σ until nothing is "3σ out", while
    * the MAD of the same data barely moves (spec-demonstrated).
    * k ≈ 1.4826·3 corresponds to 3σ under normality. Adds `grp_median`,
    * `grp_mad`, `is_outlier`.
    *
    * Two ranked per-group windows (median, then MAD) + two group-key
    * joins — heavier than sigmaClip's single unordered window, the
    * price of exact rank statistics; both shuffles are on the group key,
    * so skew/scale behavior matches every other per-key window here.
    * `tiebreakCol`: any per-row unique column (row identity) making the
    * rank — and therefore flags on even-sized groups — deterministic.
    * Null values take no part in the medians and get null
    * `is_outlier` (three-valued logic: neither flagged nor clean). */
  def madClip(df: DataFrame, groupCols: Seq[String], valueCol: String,
              tiebreakCol: String, k: Double): DataFrame = {
    val v = col(valueCol)
    val withMed = withMedian(df, groupCols, v, col(tiebreakCol), "grp_median")
    val withMad = withMedian(
      withMed.withColumn("__absdev", abs(v - col("grp_median"))),
      groupCols, col("__absdev"), col(tiebreakCol), "grp_mad")
    withMad
      .withColumn("is_outlier", abs(v - col("grp_median")) > lit(k) * col("grp_mad"))
      .drop("__absdev")
  }

  /** Winsorization — the REPAIR member of the robust-stats family
    * ([[clip]]/[[madClip]] FLAG outliers; training pipelines often want
    * values clamped to the per-group [pLow, pHigh] exact quantiles
    * instead, keeping the row but bounding its influence). Quantiles use
    * the same ceil-rank convention as the q42/q60 estimators (value at
    * row_number == ceil(n·p) under a tiebroken total order), so the
    * thresholds are exact order statistics, engine-reproducible, and
    * never null for p in (0, 1]. Adds `winsorized`, `clamped_low`,
    * `clamped_high`.
    *
    * Cost: one per-group ranked window (the quantile pass) + a join of
    * the group-sized threshold frame back to the rows — same shape as
    * [[madClip]], O(n log n) per group. */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
                tieCol: String, pLow: Double, pHigh: Double): DataFrame = {
    require(pLow > 0 && pHigh <= 1 && pLow < pHigh,
      s"need 0 < pLow < pHigh <= 1, got ($pLow, $pHigh)")
    val w = Window.partitionBy(groupCol).orderBy(col(valueCol).asc, col(tieCol).asc)
    val cw = Window.partitionBy(groupCol)
    // null values must not rank into the quantile window (Spark sorts
    // nulls FIRST, DuckDB LAST — the same parity hazard withMedian
    // filters); they pass through unclamped below
    val qs = df.filter(col(valueCol).isNotNull)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(cw))
      .groupBy(groupCol)
      .agg(
        max(when(col("__rn") === ceil(col("__cnt") * pLow), col(valueCol))).as("__qlo"),
        max(when(col("__rn") === ceil(col("__cnt") * pHigh), col(valueCol))).as("__qhi"))
    df.join(qs, Seq(groupCol), "left")
      // explicit CASE (not least/greatest): identical null-free
      // semantics in every engine, mirrored verbatim in the oracle
      .withColumn("winsorized",
        when(col(valueCol) < col("__qlo"), col("__qlo"))
          .when(col(valueCol) > col("__qhi"), col("__qhi"))
          .otherwise(col(valueCol)))
      .withColumn("clamped_low",
        coalesce((col(valueCol) < col("__qlo")).cast("long"), lit(0L)))
      .withColumn("clamped_high",
        coalesce((col(valueCol) > col("__qhi")).cast("long"), lit(0L)))
      .drop("__qlo", "__qhi")
  }
}
