package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention analysis — the status-ladder companion to
  * `Funnel`: group users by first-activity period (their cohort), then
  * count how many are still active 1, 2, … periods later. The reference's
  * results pages answer "how many observations from campaign week X were
  * still being processed in week X+k" with exactly this shape; for a
  * training-data pipeline it is contributor/source retention QA.
  */
object Retention {

  /** (cohort, period, period_offset, n_users, cohort_size, retention):
    * one row per cohort × active period. `bucket` is `"day"`, `"week"`
    * or `"month"` (date_trunc granularity — Monday-start ISO weeks,
    * matching every SQL engine's date_trunc).
    *
    * Scale shape: one groupBy(user) for first-activity (map-side
    * combining min), one distinct over (user, period) — both shuffles
    * keyed on user, so AQE can reuse the exchange — then a count keyed
    * on (cohort, period) whose result is cohorts × periods (tiny at any
    * corpus size). Cohort sizes are the offset-0 counts (a user's first
    * period is by construction an active period), surfaced via a window
    * over the already-tiny counts frame — NOT a filtered self-join,
    * which would recompute the whole events subtree a second time (the
    * plan regression the first formulation had). Retention is a
    * long/long → double divide, identical in any engine. */
  def cohorts(events: DataFrame, userCol: String, tsCol: String,
              bucket: String = "week"): DataFrame = {
    require(Set("day", "week", "month").contains(bucket),
      s"bucket must be day/week/month, got $bucket")
    val first = events
      .groupBy(col(userCol).as("__u"))
      .agg(date_trunc(bucket, min(col(tsCol))).as("cohort"))
    val activity = events
      .select(col(userCol).as("__u"), date_trunc(bucket, col(tsCol)).as("period"))
      .distinct()
    val counts = activity.join(first, Seq("__u"))
      .groupBy("cohort", "period")
      .agg(count(lit(1)).as("n_users"))
    val offset = bucket match {
      case "day" => datediff(col("period"), col("cohort")).cast("long")
      case "week" => floor(datediff(col("period"), col("cohort")) / 7).cast("long")
      case "month" => months_between(col("period"), col("cohort")).cast("long")
    }
    val byCohort = org.apache.spark.sql.expressions.Window.partitionBy("cohort")
    counts
      .withColumn("cohort_size",
        max(when(col("period") === col("cohort"), col("n_users"))).over(byCohort))
      .withColumn("period_offset", offset)
      .withColumn("retention",
        col("n_users").cast("double") / col("cohort_size").cast("double"))
      .select("cohort", "period", "period_offset", "n_users", "cohort_size", "retention")
  }
}
