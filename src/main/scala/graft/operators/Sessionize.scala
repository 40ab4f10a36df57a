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
}
