package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inactivity-gap sessionization: consecutive events of a key belong to one
  * session until the gap exceeds `gapSeconds` (observation-session grouping
  * analog). Single shuffle on the key; integer cumulative sums are exact.
  */
object Sessionize {

  /** Adds a `session_id` column (0-based per key, ordered by time). */
  def withSessionIds(df: DataFrame, key: String, ts: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(ts))
    val gapUs = gapSeconds * 1000000L
    val prev = lag(unix_micros(col(ts)), 1).over(w)
    val isNew = when(prev.isNull || (unix_micros(col(ts)) - prev) > gapUs, 1L).otherwise(0L)
    df.withColumn("session_id", sum(isNew).over(
      Window.partitionBy(key).orderBy(col(ts))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
  }
}
