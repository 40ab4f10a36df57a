package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the data-layout lever for
  * multi-dimensional scans: interleaving the bits of several columns
  * into one sort key places rows that are close in EVERY dimension into
  * the same files, so per-file min/max statistics prune box queries on
  * any filtered dimension (the Delta/Iceberg `OPTIMIZE ZORDER BY`
  * technique). A linear sort clusters only its leading column; Z-order
  * spends the same one-time sort to serve all of them.
  *
  * Everything is pure Column bit math (codegen'd shifts/masks — no UDF),
  * plus one tiny broadcast min/max aggregate for normalization; the
  * clustering write is a range repartition on the code (one shuffle, the
  * same cost as any sorted write).
  */
object ZOrder {

  /** Interleave the low `bits` of `cols` (already non-negative ints in
    * [0, 2^bits)): bit j of column i lands at position j·n + i, so the
    * code's most-significant bits alternate through every dimension's
    * most-significant bits — the Morton curve. Out-of-range inputs are
    * clamped (layout keys must never throw mid-write). */
  def mortonCode(cols: Seq[Column], bits: Int): Column = {
    val n = cols.length
    require(n >= 1, "at least one column to interleave")
    require(bits >= 1 && n * bits <= 63, s"need 1 <= bits and ${n}*bits <= 63, got bits=$bits")
    val hi = (1L << bits) - 1
    // coalesce BEFORE the clamp: Spark's least/greatest skip nulls, so a
    // null dimension would otherwise clamp to the MAX cell and pack all
    // null rows into the max-corner files (widening their envelopes);
    // cell 0 matches normalized()'s constant-column convention
    val clamped = cols.map(c =>
      greatest(lit(0L), least(lit(hi), coalesce(c.cast("long"), lit(0L)))))
    val terms = for {
      (c, i) <- clamped.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(c, j).bitwiseAND(lit(1L)), j * n + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Min/max-scale numeric columns onto [0, 2^bits) grid cells (the
    * normalization Morton interleaving needs; ranks would equalize cell
    * population but cost a global sort per dimension). Returns the input
    * plus one `__z_<col>` long per column. Constant columns map to cell
    * 0. One tiny broadcast aggregate; no shuffle of the data itself. */
  def normalized(df: DataFrame, cols: Seq[String], bits: Int): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double").as(s"__lo_$c"), max(col(c)).cast("double").as(s"__hi_$c")))
    val ranges = broadcast(df.agg(aggs.head, aggs.tail: _*))
    val scaled = df.crossJoin(ranges)
    val cells = (1L << bits) - 1
    cols.foldLeft(scaled) { (acc, c) =>
      val span = col(s"__hi_$c") - col(s"__lo_$c")
      acc.withColumn(s"__z_$c",
        when(span > 0.0,
          floor((col(c).cast("double") - col(s"__lo_$c")) / span * cells).cast("long"))
          .otherwise(lit(0L)))
    }.drop(cols.flatMap(c => Seq(s"__lo_$c", s"__hi_$c")): _*)
  }

  /** Cluster rows by the Z-order of `cols`: adds `zorder`, range-
    * repartitions on it into `numFiles` partitions and sorts within each
    * — written out as-is, every file covers a compact Morton range, so
    * each file's min/max envelope is tight in EVERY interleaved
    * dimension and box-query pruning works on all of them. */
  def cluster(df: DataFrame, cols: Seq[String], numFiles: Int, bits: Int = 16): DataFrame = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val withCode = normalized(df, cols, bits)
      .withColumn("zorder", mortonCode(cols.map(c => col(s"__z_$c")), bits))
      .drop(cols.map(c => s"__z_$c"): _*)
    withCode
      .repartitionByRange(numFiles, col("zorder"))
      .sortWithinPartitions("zorder")
  }
}
