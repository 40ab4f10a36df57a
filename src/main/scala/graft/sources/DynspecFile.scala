package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** psrflux dynamic-spectrum text files — the whitespace-separated format
  * `calc_dynspec_zap_fraction` reads with np.loadtxt
  * (archive_utils.py:118): `#`-comment lines, then columns
  * (time_idx, chan_idx, time_s, freq_mhz, flux, flux_err); a cell is
  * zapped when flux == 0 AND flux_err == 0 (columns 4 and 5).
  */
object DynspecFile {

  /** Distributed parse of one or many dynspec files. */
  def load(spark: SparkSession, path: String): DataFrame = {
    spark.read.text(path)
      // trim before the comment test: np.loadtxt also accepts
      // whitespace-indented comment lines
      .filter(!trim(col("value")).startsWith("#") && length(trim(col("value"))) > 0)
      .select(split(trim(col("value")), "\\s+").as("f"))
      .filter(size(col("f")) >= 6)
      .select(
        element_at(col("f"), 1).cast("int").as("time_idx"),
        element_at(col("f"), 2).cast("int").as("chan_idx"),
        element_at(col("f"), 3).cast("double").as("time_s"),
        element_at(col("f"), 4).cast("double").as("freq_mhz"),
        element_at(col("f"), 5).cast("double").as("flux"),
        element_at(col("f"), 6).cast("double").as("flux_err"),
      )
      .withColumn("zapped", col("flux") === 0.0 && col("flux_err") === 0.0)
  }

  /** Zapped-cell fraction (archive_utils.py:118), distributed. An empty
    * dynspec (headers only) yields 0.0 rather than a null-unboxing NPE. */
  def zapFraction(dynspec: DataFrame): Double = {
    val row = dynspec.agg(
      coalesce(sum(col("zapped").cast("long")).cast("double") / count(lit(1)), lit(0.0))
        .as("frac"))
      .head()
    row.getDouble(0)
  }
}
