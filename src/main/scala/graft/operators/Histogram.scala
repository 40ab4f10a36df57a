package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-width histogram bucketing — the distribution profile behind
  * every "value histogram per channel/band" plot in the reference's
  * results pages, and the standard first look at any numeric column.
  *
  * `bucket = clamp(floor((v − lo) / width), 0, nBins−1)` — a pure map
  * expression, so the histogram is one map stage plus one
  * (group, bucket)-keyed count aggregate with map-side partial
  * combine: at most groups×nBins rows ever cross the wire regardless
  * of input size. Out-of-range values clamp into the edge buckets
  * (count-preserving); null values get a null bucket.
  */
object Histogram {

  def bucket(v: Column, lo: Double, width: Double, nBins: Int): Column = {
    require(width > 0, s"width must be positive, got $width")
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    greatest(lit(0L), least(lit(nBins - 1L), floor((v - lit(lo)) / lit(width)).cast("long")))
  }

  /** Counts (and exact decimal value sums) per (groupCols, bucket). */
  def fixedWidth(df: DataFrame, groupCols: Seq[String], valueCol: String,
                 lo: Double, width: Double, nBins: Int): DataFrame = {
    import graft.functions.Num.dsum
    df.withColumn("bucket", bucket(col(valueCol), lo, width, nBins))
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(count(lit(1)).as("n"), dsum(col(valueCol)).as("sum_value"))
  }
}
