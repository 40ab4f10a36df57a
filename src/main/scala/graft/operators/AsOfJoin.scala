package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the most recent right row with
  * `rightTime <= leftTime` for the same key.
  *
  * Engine-level form of meerpipe's instrument-delay correction
  * (`dlyfix.getcorrection`, scripts/dlyfix.py:128), which matches each
  * observation against the config record valid at its MJD.
  *
  * Scale design: the classic union + last-non-null-window formulation —
  * ONE shuffle on the key, no broadcast requirement, works when both sides
  * are 100 TB facts. Window frames are per-key, so cost tracks per-key
  * cardinality. (A broadcast binary-search variant would avoid the shuffle
  * for small right sides; AQE already handles the small-side case well
  * enough that we keep one code path.)
  */
object AsOfJoin {

  /** @param rightTiebreak column resolving equal-timestamp right rows
    *        deterministically (max wins, in the column's own ordering —
    *        the type is carried, not coerced, so string/long tiebreaks
    *        keep their native order exactly like the merge exec). */
  def join(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      rightTiebreak: Option[String] = None,
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightSchema = right.schema

    def rtype(name: String) = rightSchema(name).dataType

    // The carried right columns travel as ONE struct so the window fill
    // below picks the most recent right ROW atomically — per-column
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
      // null-time right rows can never satisfy rightTime <= leftTime;
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

    // Right rows sort before left rows at equal time (tag 0 < 1) so a
    // config taking effect exactly at the event time is visible to it.
    val w = Window.partitionBy(leftKey)
      .orderBy(col(leftTime), col("__tag"), col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = unioned
      .withColumn("__f", last(col("__carry"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)

    rightCols.foldLeft(
      filled.withColumn("asof_time", col("__f.__t"))
    ) { (df, c) => df.withColumn(c, col(s"__f.$c")) }
      .drop("__tag", "__tb", "__carry", "__f")
  }
}
