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
  * work, no extra scans), then `stack` unpivots it to per-column rows.
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
    val stackArgs = cols
      .map(c => s"'$c', `__cnt_$c`, `__nd_$c`, `__min_$c`, `__max_$c`")
      .mkString(", ")
    one.select(
      col("__rows").as("n_rows"),
      expr(s"stack(${cols.length}, $stackArgs)")
        .as(Seq("col_name", "n_present", "n_distinct", "min_val", "max_val")),
    ).select("col_name", "n_rows", "n_present", "n_distinct", "min_val", "max_val")
  }
}
