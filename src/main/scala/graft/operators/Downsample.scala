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
}
