package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Downsampling operators — engine-level forms of meerpipe's scrunching:
  * `bscrunch_to_nbin` (archive_utils.py:74, integer-factor phase-bin
  * scrunch) and the smoothing used before S/N estimation.
  */
object Downsample {

  /** Integer-factor downsample: consecutive runs of `factor` rows per key
    * (ordered by `ts`, tie-broken by `tiebreak`) collapse into one bin id.
    * Adds `bin` (0-based). One shuffle on the key. */
  def byFactor(df: DataFrame, key: String, ts: String, tiebreak: String, factor: Int): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts), col(tiebreak))
    df.withColumn("bin",
      floor((row_number().over(w) - lit(1)) / lit(factor.toDouble)).cast("long"))
  }

  /** Trailing boxcar mean over the previous `width` rows per key (exact
    * decimal running sums → deterministic). Adds `smooth`. */
  def boxcar(df: DataFrame, key: String, ts: String, tiebreak: String,
             valueCol: String, width: Int): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts), col(tiebreak))
      .rowsBetween(-(width - 1), Window.currentRow)
    df.withColumn("smooth",
      sum(col(valueCol).cast("decimal(38,6)")).over(w).cast("double") /
        count(col(valueCol)).over(w))
  }

  /** Trailing TIME-range rolling aggregate: per key, sum/count of
    * `valueCol` over the last `windowSeconds` of EVENT TIME up to and
    * including each row — the wall-clock companion to [[boxcar]]'s
    * row-count frame (a row-frame is wrong when event cadence varies:
    * 5 rows is 5 seconds for a hot key and 5 days for a cold one). Adds
    * `roll_sum`, `roll_n`. Rows sharing the same timestamp share one
    * frame (RANGE semantics), so results are set-deterministic; the
    * decimal accumulator makes the sum frame-order-exact.
    *
    * Scale shape: one key-partitioned sort window — the same shuffle
    * every per-key window here costs; no self-join (the naive
    * time-window form is `events ⋈ events ON ts BETWEEN` — quadratic
    * per key). */
  def rollingRange(df: DataFrame, key: String, ts: String, valueCol: String,
                   windowSeconds: Long): DataFrame = {
    require(windowSeconds >= 0, s"windowSeconds must be >= 0, got $windowSeconds")
    val us = windowSeconds * 1000000L
    val w = Window.partitionBy(key).orderBy(col("__us"))
      .rangeBetween(-us, Window.currentRow)
    df.withColumn("__us", unix_micros(col(ts).cast("timestamp")))
      .withColumn("roll_sum",
        sum(col(valueCol).cast("decimal(38,6)")).over(w).cast("double"))
      .withColumn("roll_n", count(col(valueCol)).over(w))
      .drop("__us")
  }
}
