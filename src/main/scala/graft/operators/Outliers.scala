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
}
