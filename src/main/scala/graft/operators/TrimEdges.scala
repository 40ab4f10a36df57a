package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trim all-zapped leading/trailing edges of a (time, channel) grid —
  * `Dynspec.trim_edges` (used at generate_images_results.py:176): after
  * RFI zapping, rows/columns at the borders that contain no valid samples
  * are dropped before refilling.
  *
  * One aggregation computes the valid bounding box (4 scalars, broadcast
  * back via cross join) and one filter applies it — two passes, no
  * shuffle of the grid itself.
  */
object TrimEdges {

  /** Keep only rows inside the bounding box of cells where `isValid`. */
  def apply(df: DataFrame, timeCol: String, chanCol: String, isValid: Column): DataFrame = {
    val bounds = df.filter(isValid).agg(
      min(col(timeCol)).as("__tmin"), max(col(timeCol)).as("__tmax"),
      min(col(chanCol)).as("__cmin"), max(col(chanCol)).as("__cmax"))
    df.crossJoin(broadcast(bounds))
      .filter(col(timeCol) >= col("__tmin") && col(timeCol) <= col("__tmax") &&
        col(chanCol) >= col("__cmin") && col(chanCol) <= col("__cmax"))
      .drop("__tmin", "__tmax", "__cmin", "__cmax")
  }
}
