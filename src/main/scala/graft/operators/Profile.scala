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

  /** Profile numeric (or numeric-castable) columns. `approx = true`
    * swaps the exact multi-distinct for HLL sketches — same single-scan
    * shape with mergeable partials and no Expand, the 100 TB form
    * (3.8× faster at sf0.1). */
  def numeric(df: DataFrame, cols: Seq[String], approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "at least one column to profile")
    // Positional helper names: caller column names are DATA and must not
    // ride through any name parser (col("a.b") would parse the dot as
    // field access; a backtick breaks outright). Aliases set via .as()
    // are literal; these generated names are parser-safe by construction.
    def src(c: String) = df.col(s"`${c.replace("`", "``")}`")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        count(src(c)).as(s"__cnt_$i"),
        (if (approx) approx_count_distinct(src(c)) else countDistinct(src(c))).as(s"__nd_$i"),
        min(src(c)).cast("double").as(s"__min_$i"),
        max(src(c)).cast("double").as(s"__max_$i"),
      )
    }
    val one = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val rows = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("col_name"), col(s"__cnt_$i").as("n_present"),
        col(s"__nd_$i").as("n_distinct"), col(s"__min_$i").as("min_val"),
        col(s"__max_$i").as("max_val"))
    }
    one.select(col("__rows").as("n_rows"), explode(array(rows: _*)).as("__r"))
      .select(col("__r.col_name").as("col_name"), col("n_rows"),
        col("__r.n_present").as("n_present"), col("__r.n_distinct").as("n_distinct"),
        col("__r.min_val").as("min_val"), col("__r.max_val").as("max_val"))
  }
}
