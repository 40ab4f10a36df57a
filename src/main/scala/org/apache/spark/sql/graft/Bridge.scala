package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}

/** Thin bridge into Spark's `private[sql]` surface, hosted in a subpackage
  * of org.apache.spark.sql (standard extension-library pattern: the public
  * API has no way to build a DataFrame from a custom LogicalPlan or to
  * pull the catalyst Expression out of a Column).
  */
object Bridge {

  /** DataFrame from a custom LogicalPlan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  /** Catalyst expression behind a Column. */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Column wrapping a catalyst Expression. */
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Analyzed logical plan of a DataFrame. */
  def logicalPlan(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed
}
