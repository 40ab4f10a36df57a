package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-scan data profiling — the QA pass run before a table is admitted
  * to a pipeline (PSRDB's summary queries over observation metadata;
  * corpus intake checks in a training-data pipeline).
  *
  * Output: one row per profiled column with row count, present (non-null)
  * count, exact distinct count, and min/max cast to double. Everything
  * computes in a SINGLE scan: one aggregate row holding every metric
  * (Spark plans the multi-distinct via one Expand — rows × #columns map
  * work, no extra scans), unpivoted to per-column rows.
  * At 100 TB swap `countDistinct` for `approx_count_distinct` (same
  * shape, sketch-mergeable, no Expand); the exact form is kept because
  * it is oracle-checkable.
  */
object Profile {

  /** Profile numeric (or numeric-castable) columns. */
  def numeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column to profile")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"),
      )
    }
    val one = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    // Column-built unpivot (not a stack() SQL string): column names are
    // caller data — a backtick/quote in one must not reach the parser
    val rows = cols.map { c =>
      struct(lit(c).as("col_name"), col(s"__cnt_$c").as("n_present"),
        col(s"__nd_$c").as("n_distinct"), col(s"__min_$c").as("min_val"),
        col(s"__max_$c").as("max_val"))
    }
    one.select(col("__rows").as("n_rows"), explode(array(rows: _*)).as("__r"))
      .select(col("__r.col_name").as("col_name"), col("n_rows"),
        col("__r.n_present").as("n_present"), col("__r.n_distinct").as("n_distinct"),
        col("__r.min_val").as("min_val"), col("__r.max_val").as("max_val"))
  }
}
