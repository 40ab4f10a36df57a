package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap refill via neighbor interpolation — engine-level form of
  * `scintools` `Dynspec.refill` (meerpipe regenerates masked dynamic-
  * spectrum cells from neighbors after RFI zapping).
  */
object Interpolate {

  /** Adds `refilled`: where `isMissing`, the mean of the nearest preceding
    * and following non-missing values on the key's timeline (one side if at
    * an edge); the original value otherwise. One shuffle on the key.
    * `tiebreak` columns make the order total when timestamps collide so
    * `last`/`first` neighbor picks are deterministic under repartitioning. */
  def refillLinear(df: DataFrame, key: String, ts: String, valueCol: String,
                   isMissing: Column, tiebreak: Seq[String] = Nil): DataFrame = {
    val good = when(!isMissing, col(valueCol))
    val fwd = (col(ts) +: tiebreak.map(col)).map(_.asc)
    val rev = (col(ts) +: tiebreak.map(col)).map(_.desc)
    // Both neighbor lookups are RUNNING frames (unboundedPreceding → -1):
    // Spark evaluates those incrementally in O(n) per partition. The
    // backward neighbor uses a REVERSE-ordered running frame — the obvious
    // `rowsBetween(1, unboundedFollowing)` + first(ignoreNulls) re-scans
    // from every row to partition end, O(n²) per key: a real skew killer
    // at 10⁶+ rows on one key. Value-identical: in reverse order, "last
    // non-null before me" IS the nearest following non-null. Costs one
    // extra in-partition sort (no extra shuffle — same key clustering).
    val before = Window.partitionBy(key).orderBy(fwd: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val after = Window.partitionBy(key).orderBy(rev: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prevGood = last(good, ignoreNulls = true).over(before)
    val nextGood = last(good, ignoreNulls = true).over(after)
    val filled = when(prevGood.isNotNull && nextGood.isNotNull, (prevGood + nextGood) / 2.0)
      .otherwise(coalesce(prevGood, nextGood, col(valueCol)))
    df.withColumn("refilled", when(isMissing, filled).otherwise(col(valueCol)))
  }
}
