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

  /** Boundary-safe pattern token for one literal event type: [[sequencePattern]]
    * matches against the concatenation of `\u0001<type>\u0002` tokens, so a
    * pattern built from `tok` atoms can never match inside another type
    * ("view" vs "preview") or across token boundaries, with no lookaround
    * (stays in the Java∩RE2 subset an oracle can mirror). `eventType` is
    * spliced into the regex verbatim — it must be a literal with no regex
    * metacharacters (escape it yourself otherwise). */
  def tok(eventType: String): String = "\u0001" + eventType + "\u0002"

  /** Regex pattern matching over each key's time-ordered event-type
    * sequence — the MATCH_RECOGNIZE-shaped generalization of [[steps]]:
    * where the funnel asks "did the FIRST occurrences happen in order",
    * this counts EVERY (non-overlapping, left-to-right) occurrence of an
    * arbitrary event-type pattern. Each named pattern adds a long count
    * column. Build patterns from [[tok]] atoms plus regex operators, e.g.
    * `tok("view") + tok("click")` or
    * `tok("error") + "(" + tok("error") + ")*" + tok("signup")` — each
    * type travels as a delimited `\u0001type\u0002` token, so type
    * strings that are substrings of other types (or contain spaces)
    * cannot miscount.
    *
    * The sequence is deterministic: events sort by (`tsCol`, `tieCol`)
    * — a unique tiebreak — inside an array_sort, so shuffle order can't
    * reorder ties.
    *
    * Scale shape: per-key state is the key's full type sequence, so the
    * operator REFUSES unbounded keys instead of OOMing an executor on
    * them: a first counting pass (map-side combining, bytes per key)
    * raise_errors the job as soon as any key exceeds `maxEvents` —
    * BEFORE any oversized sequence is collected. One hot key (a bot
    * user, a default id) at 100 TB therefore fails loudly with the key
    * name in the message, not with a multi-GB row. For legitimately
    * unbounded keys compose with a time/session window first
    * ([[Sessionize]], q76). The counting pass rides the same
    * key-partitioned exchange as the collect (ReuseExchange), so the
    * guard costs one extra aggregate, not an extra shuffle. */
  def sequencePattern(df: DataFrame, keyCol: String, tsCol: String,
                      tieCol: String, typeCol: String,
                      patterns: Seq[(String, String)],
                      maxEvents: Int = 1000000): DataFrame = {
    require(patterns.nonEmpty, "at least one (name, regex) pattern required")
    require(maxEvents >= 1, s"maxEvents must be >= 1, got $maxEvents")
    // loud per-key state bound: filter (not project — never pruned) on the
    // pre-collect count; raise_error carries the offending key
    val guardedKeys = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__n"))
      .filter(
        when(col("__n") > maxEvents,
          raise_error(concat(
            lit("Funnel.sequencePattern: key "), col(keyCol).cast("string"),
            lit(" has "), col("__n").cast("string"),
            lit(s" events > maxEvents=$maxEvents — window the input first " +
              "(Sessionize.assign / session_window) or raise maxEvents"))).cast("boolean"))
          .otherwise(lit(true)))
      .select(col(keyCol))
    val seqCol = array_join(
      transform(
        array_sort(collect_list(struct(col(tsCol), col(tieCol),
          concat(lit("\u0001"), col(typeCol), lit("\u0002")).as("__t")))),
        s => s.getField("__t")),
      "")
    val patCols = patterns.map { case (name, regex) =>
      regexp_count(col("__seq"), lit(regex)).cast("long").as(name)
    }
    df.join(guardedKeys, Seq(keyCol))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"), seqCol.as("__seq"))
      .select(col(keyCol) +: col("n_events") +: patCols: _*)
  }
}
