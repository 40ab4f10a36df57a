package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inactivity-gap sessionization: consecutive events of a key belong to one
  * session until the gap exceeds `gapSeconds` (observation-session grouping
  * analog). Single shuffle on the key; integer cumulative sums are exact.
  */
object Sessionize {

  /** Adds a `session_id` column (0-based per key, ordered by time).
    * `tiebreak` columns make the order total when timestamps collide —
    * without them, equal-ts rows would make `lag` nondeterministic under
    * repartitioning (on any engine). */
  def withSessionIds(df: DataFrame, key: String, ts: String, gapSeconds: Long,
                     tiebreak: Seq[String] = Nil): DataFrame = {
    val order = (col(ts) +: tiebreak.map(col)).map(_.asc)
    val w = Window.partitionBy(key).orderBy(order: _*)
    val gapUs = gapSeconds * 1000000L
    val prev = lag(unix_micros(col(ts)), 1).over(w)
    val isNew = when(prev.isNull || (unix_micros(col(ts)) - prev) > gapUs, 1L).otherwise(0L)
    df.withColumn("session_id", sum(isNew).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
  }

  /** Telemetry debounce: keep an event only when its key's PREVIOUS event
    * is absent or at least `horizonSeconds` older — duplicate-burst
    * suppression for retried sends / double-clicks / chatty sensors (the
    * batch companion to streaming `dropDuplicatesWithinWatermark`-style
    * dedup, D4).
    *
    * Lag-based, not chain-based, ON PURPOSE: each row compares to its
    * physical predecessor, so a steady sub-horizon drizzle keeps only…
    * nothing after the first row, while the greedy "anchor then skip
    * until horizon" chain semantics would keep periodic survivors. The
    * lag form is order-deterministic, one window pass, and mirrors in
    * any SQL engine; the chain form needs a sequential scan (its
    * streaming analog is the stateful D4 operator).
    *
    * One key-partitioned window — the same single shuffle every per-key
    * ordering costs here; `tiebreak` totalizes colliding timestamps. */
  def debounce(df: DataFrame, keyCols: Seq[String], ts: String,
               horizonSeconds: Long, tiebreak: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(horizonSeconds >= 0, s"horizonSeconds must be >= 0, got $horizonSeconds")
    val order = (col(ts) +: tiebreak.map(col)).map(_.asc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    val prev = lag(unix_micros(col(ts)), 1).over(w)
    df.withColumn("__prev_us", prev)
      .filter(col("__prev_us").isNull ||
        (unix_micros(col(ts)) - col("__prev_us")) >= horizonSeconds * 1000000L)
      .drop("__prev_us")
  }
}
