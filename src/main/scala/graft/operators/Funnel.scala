package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis: how many users performed step 1, then
  * step 2 strictly after it, then step 3 after that… — the
  * session-progression rollup (PSRDB's obs → processed → TOA-accepted
  * status ladder; signup→activation funnels in event analytics).
  *
  * Semantics: a user completes a prefix of `steps` if the FIRST
  * occurrence times of the steps are strictly increasing
  * (first(s₁) < first(s₂) < …). Strictly-first semantics, not
  * any-subsequence matching: deterministic, one aggregate per user,
  * and the form every funnel dashboard actually computes.
  *
  * Scale shape: one user-keyed aggregate (min-when per step, map-side
  * combining), then a single global roll-up row stack-unpivoted to one
  * row per step. Nothing holds per-event state; at 100 TB the only
  * shuffle is the per-user partial-aggregate merge.
  */
object Funnel {

  /** @return one row per step: (step, step_idx starting at 1, n_users
    *         that completed the prefix ending at this step). */
  def steps(df: DataFrame, userCol: String, typeCol: String, tsCol: String,
            steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "at least one funnel step required")
    require(steps.distinct == steps, "funnel steps must be distinct")
    val mins = steps.zipWithIndex.map { case (s, i) =>
      min(when(col(typeCol) === s, col(tsCol))).as(s"__t$i")
    }
    val perUser = df.groupBy(col(userCol)).agg(mins.head, mins.tail: _*)
    // prefix-completion predicate for step i: every earlier first-time
    // exists and the chain strictly increases
    val prefixDone = steps.indices.map { i =>
      (0 to i).map { j =>
        if (j == 0) col("__t0").isNotNull
        else col(s"__t$j").isNotNull && col(s"__t${j - 1}") < col(s"__t$j")
      }.reduce(_ && _)
    }
    val counts = perUser.agg(
      sum(when(prefixDone.head, 1L).otherwise(0L)).as("__n0"),
      prefixDone.tail.zipWithIndex.map { case (p, i) =>
        sum(when(p, 1L).otherwise(0L)).as(s"__n${i + 1}")
      }: _*)
    // Column-built unpivot (not a stack() SQL string): step names are
    // caller data and must never reach the SQL parser — a quote in a
    // step name would break parsing (or worse, inject)
    val rows = steps.zipWithIndex.map { case (s, i) =>
      struct(lit(s).as("step"), lit(i + 1).as("step_idx"), col(s"__n$i").as("n_users"))
    }
    counts.select(explode(array(rows: _*)).as("__r"))
      .select(col("__r.step"), col("__r.step_idx"), col("__r.n_users"))
  }

  /** Regex pattern matching over each key's time-ordered event-type
    * sequence — the MATCH_RECOGNIZE-shaped generalization of [[steps]]:
    * where the funnel asks "did the FIRST occurrences happen in order",
    * this counts EVERY (non-overlapping, left-to-right) occurrence of an
    * arbitrary event-type pattern ("view click purchase", "error+
    * signup", …). Each named pattern adds a long count column.
    *
    * The sequence is deterministic: events sort by (`tsCol`, `tieCol`)
    * — a unique tiebreak — inside an array_sort, so shuffle order can't
    * reorder ties. Patterns are matched on the space-joined type string;
    * keep them within the RE2-compatible subset (no lookaround) if an
    * oracle must mirror them.
    *
    * Scale shape: one groupBy(key) collecting the type sequence — state
    * is per-key sequence-sized, the right shape when per-key event
    * counts are bounded (sessions, days); for unbounded keys compose
    * with a time/session window first ([[Sessionize]], q76). No
    * self-join, no window sort beyond the per-key array sort. */
  def sequencePattern(df: DataFrame, keyCol: String, tsCol: String,
                      tieCol: String, typeCol: String,
                      patterns: Seq[(String, String)]): DataFrame = {
    require(patterns.nonEmpty, "at least one (name, regex) pattern required")
    val seqCol = array_join(
      transform(
        array_sort(collect_list(struct(col(tsCol), col(tieCol), col(typeCol).as("__t")))),
        s => s.getField("__t")),
      " ")
    val patCols = patterns.map { case (name, regex) =>
      regexp_count(col("__seq"), lit(regex)).cast("long").as(name)
    }
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"), seqCol.as("__seq"))
      .select(col(keyCol) +: col("n_events") +: patCols: _*)
  }
}
