package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** As-of join: for each left row, attach the right row for the same key
  * that is nearest in time under a direction rule:
  *   - `backward` (default): most recent right with rightTime ≤ leftTime
  *   - `forward`: earliest right with rightTime ≥ leftTime
  *   - `nearest`: whichever of the two is closer; exact ties prefer the
  *     backward match (deterministic)
  *
  * Engine-level form of meerpipe's instrument-delay correction
  * (`dlyfix.getcorrection`, scripts/dlyfix.py:128), which matches each
  * observation against the config record valid at its MJD; forward and
  * nearest complete the standard merge-asof surface.
  *
  * Scale design: the classic union + last-non-null-window formulation —
  * ONE shuffle on the key, no broadcast requirement, works when both sides
  * are 100 TB facts. Window frames are per-key RUNNING frames (O(n));
  * `forward` uses the reverse-ordered traversal, `nearest` evaluates both
  * and picks per row. (The custom sorted-merge AsOfJoinMergeExec covers
  * the backward AND forward hot paths with a single merge pass; only
  * `nearest` stays window-only.)
  */
object AsOfJoin {

  /** @param rightTiebreak column resolving equal-timestamp right rows
    *        deterministically (max wins, in the column's own ordering —
    *        the type is carried, not coerced, so string/long tiebreaks
    *        keep their native order exactly like the merge exec).
    * @param direction "backward" | "forward" | "nearest" */
  def join(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      rightTiebreak: Option[String] = None,
      direction: String = "backward",
  ): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got '$direction'")
    val leftCols = left.columns.toSeq
    val rightSchema = right.schema

    def rtype(name: String) = rightSchema(name).dataType

    // The carried right columns travel as ONE struct so the window fill
    // below picks the matched right ROW atomically — per-column
    // ignoreNulls fills would stitch values from different rows whenever
    // a carried column is null. The matched time rides in the struct too.
    val carryType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__t", rightSchema(rightTime).dataType) +:
        rightCols.map(c => org.apache.spark.sql.types.StructField(c, rtype(c))))

    val taggedLeft = left
      .withColumn("__tag", lit(1))
      .withColumn("__carry", lit(null).cast(carryType))
      .withColumn("__tb",
        rightTiebreak.map(c => lit(null).cast(rtype(c))).getOrElse(lit(null).cast("int")))

    val taggedRight = {
      // null-time right rows can never satisfy any direction's bound;
      // drop them (the merge exec filters identically)
      val base = right.filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
        .select(
          col(rightKey).as(leftKey) +:
            col(rightTime).as(leftTime) +:
            rightTiebreak.map(c => col(c).as("__tb")).getOrElse(lit(0).as("__tb")) +:
            struct(col(rightTime).as("__t") +: rightCols.map(col): _*).as("__carry") +: Nil: _*
        ).withColumn("__tag", lit(0))
      // null-fill the left-only columns
      leftCols.filterNot(c => c == leftKey || c == leftTime).foldLeft(base) {
        (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    }

    val shape = leftCols.map(col) :+ col("__carry") :+ col("__tb") :+ col("__tag")
    val unioned = taggedLeft.select(shape: _*).unionByName(taggedRight.select(shape: _*))

    // Right rows sort before left rows at equal time (tag 0 < 1) in BOTH
    // traversals, so a config taking effect exactly at the event time is
    // visible to it (≤ and ≥ are both inclusive); among equal-time right
    // rows, last() lands on the max tiebreak either way. The descending
    // traversal pins nulls FIRST (plain .desc = nulls last, which would
    // put null-time left rows at the end with every right row in frame —
    // matching them to the minimum-time right row instead of nothing);
    // nulls-first gives them an all-null frame, consistent with backward.
    def running(order: Seq[Column]) =
      Window.partitionBy(leftKey).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val backWin = running(Seq(col(leftTime).asc, col("__tag").asc, col("__tb").asc_nulls_first))
    val fwdWin  = running(Seq(col(leftTime).desc_nulls_first, col("__tag").asc, col("__tb").asc_nulls_first))

    val filled = direction match {
      case "backward" =>
        unioned.withColumn("__f", last(col("__carry"), ignoreNulls = true).over(backWin))
      case "forward" =>
        unioned.withColumn("__f", last(col("__carry"), ignoreNulls = true).over(fwdWin))
      case "nearest" =>
        // Time axis for the distance compare. backward/forward need only
        // ORDERING (any orderable type works); nearest needs SUBTRACTION,
        // so reject types where cast-to-double would be null (strings) —
        // a silent null distance would quietly return the backward match
        // however far away it is. Integral axes (incl. nanosecond-epoch
        // longs > 2^53, where a double would round 100ns and 300ns gaps
        // together and pick the farther side) stay in LONG arithmetic;
        // only genuinely fractional axes go through double.
        import org.apache.spark.sql.types.{ByteType, DateType, IntegerType, LongType, NumericType, ShortType, TimestampNTZType}
        val t: Column => Column = left.schema(leftTime).dataType match {
          case TimestampType => c => unix_micros(c)
          case TimestampNTZType =>
            // tz-invariant: epoch micros computed arithmetically from the
            // naive (UTC-wall-clock) fields — a bare cast shifts by the
            // session offset, and around a DST transition that offset
            // differs BETWEEN the two values being subtracted, corrupting
            // the distance by an hour (and a convert-then-cast round trip
            // is ambiguous in the fall-back hour). On a UTC session the
            // cast is the identity — skip the per-row field extraction.
            if (graft.sources.Tables.sessionIsUtc(left.sparkSession))
              c => unix_micros(c.cast("timestamp"))
            else
              c => graft.sources.Tables.ntzMicros(c)
          case DateType => c => unix_date(c).cast("long")
          case LongType | IntegerType | ShortType | ByteType => c => c.cast("long")
          case _: NumericType => c => c.cast("double")
          case other => throw new IllegalArgumentException(
            s"direction=nearest needs a numeric/timestamp/date time column, got $other " +
              s"for '$leftTime' (backward/forward work on any orderable type)")
        }
        val b = last(col("__carry"), ignoreNulls = true).over(backWin)
        val f = last(col("__carry"), ignoreNulls = true).over(fwdWin)
        unioned
          .withColumn("__b", b).withColumn("__fw", f)
          .withColumn("__f",
            when(col("__b").isNull, col("__fw"))
              .when(col("__fw").isNull, col("__b"))
              // strictly-closer forward wins; ties prefer backward
              .when(t(col("__fw.__t")) - t(col(leftTime)) <
                    t(col(leftTime)) - t(col("__b.__t")), col("__fw"))
              .otherwise(col("__b")))
          .drop("__b", "__fw")
    }

    rightCols.foldLeft(
      filled.filter(col("__tag") === 1).withColumn("asof_time", col("__f.__t"))
    ) { (df, c) => df.withColumn(c, col(s"__f.$c")) }
      .drop("__tag", "__tb", "__carry", "__f")
  }
}
