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
    *        deterministically (max wins). */
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

    // Unified schema: all left columns + the carried right columns.
    val taggedLeft = rightCols.foldLeft(left.withColumn("__tag", lit(1))) {
      (df, c) => df.withColumn(s"__r_$c", lit(null).cast(rtype(c)))
    }.withColumn("__tb", lit(null).cast("double"))

    val tb = rightTiebreak.map(c => col(c).cast("double")).getOrElse(lit(0.0))
    val taggedRight = {
      val base = right.select(
        col(rightKey).as(leftKey) +:
          col(rightTime).as(leftTime) +:
          tb.as("__tb") +:
          rightCols.map(c => col(c).as(s"__r_$c")): _*
      ).withColumn("__tag", lit(0))
      // null-fill the left-only columns
      leftCols.filterNot(c => c == leftKey || c == leftTime).foldLeft(base) {
        (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    }

    val unioned = taggedLeft.select(
      (leftCols.map(col) ++ rightCols.map(c => col(s"__r_$c")) :+ col("__tb") :+ col("__tag")): _*
    ).unionByName(taggedRight.select(
      (leftCols.map(col) ++ rightCols.map(c => col(s"__r_$c")) :+ col("__tb") :+ col("__tag")): _*
    ))

    // Right rows sort before left rows at equal time (tag 0 < 1) so a
    // config taking effect exactly at the event time is visible to it.
    val w = Window.partitionBy(leftKey)
      .orderBy(col(leftTime), col("__tag"), col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = rightCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__f_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }

    val out = filled.filter(col("__tag") === 1)
    val matchTime = last(when(col("__tag") === 0, col(leftTime)), ignoreNulls = true).over(w)
    val withMatch = filled
      .withColumn("__match_time", matchTime)
      .filter(col("__tag") === 1)

    rightCols.foldLeft(withMatch) { (df, c) =>
      df.withColumn(c, col(s"__f_$c")).drop(s"__r_$c", s"__f_$c")
    }.withColumnRenamed("__match_time", "asof_time")
      .drop("__tag", "__tb")
  }
}
