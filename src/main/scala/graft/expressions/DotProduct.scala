package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two numeric array columns → double.
  *
  * This replaces the `zip_with` + `aggregate` higher-order-function fold:
  * HOF lambdas are interpreted in Spark (they sit outside whole-stage
  * codegen and re-evaluate shared subtrees), which made per-pair cosine the
  * dominant cost of the ANN queries. This expression codegens to a tight
  * primitive loop — no boxing, no lambda dispatch — and participates in
  * whole-stage codegen, so an ANN scan stays in one generated function.
  *
  * The accumulation order is the array order (sequential), identical in the
  * interpreted and codegen paths, so results are deterministic across
  * partitionings and plan changes. float32×float32 products are exact in
  * double; only the summation rounds, keeping results within a few ulps of
  * the decimal-exact reference path (measured ≤1e-13 relative on 64-dim
  * unit-scale embeddings — far inside the oracle compare tolerance).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  private def elem(t: DataType): Option[DataType] = t match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elem(left.dataType).isDefined && elem(right.dataType).isDefined) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
    }

  // Static dispatch once at plan time; the per-row path is monomorphic.
  private lazy val fn: String = (elem(left.dataType).get, elem(right.dataType).get) match {
    case (FloatType, FloatType) => "dotFF"
    case (FloatType, DoubleType) => "dotFD"
    case (DoubleType, FloatType) => "dotDF"
    case (DoubleType, DoubleType) => "dotDD"
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    fn match {
      case "dotFF" => DotMath.dotFF(x, y)
      case "dotFD" => DotMath.dotFD(x, y)
      case "dotDF" => DotMath.dotDF(x, y)
      case "dotDD" => DotMath.dotDD(x, y)
    }
  }

  // Static dispatch: the method name is resolved once at codegen time, so
  // the per-row path is a single monomorphic call with no string match.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("dotBoxed")
      s"""
         |java.lang.Double $boxed = graft.expressions.DotMath$$.MODULE$$.$fn($a, $b);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Null for ragged lengths or null elements — the same null-propagating
  * semantics as the zip_with + aggregate composition this expression
  * replaced. The null check is folded into the single accumulation pass
  * (one walk over the arrays); the boxed result is the nullability
  * carrier and is elided by escape analysis on the hot non-null path. */
object DotMath {

  def dotFF(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def dotFD(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getDouble(i)
      i += 1
    }
    acc
  }

  def dotDF(a: ArrayData, b: ArrayData): java.lang.Double = dotFD(b, a)

  def dotDD(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

object DotProduct {
  /** Column-API entry for numeric array columns. */
  def of(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(DotProduct(
      org.apache.spark.sql.graft.Bridge.expression(a),
      org.apache.spark.sql.graft.Bridge.expression(b)))
}
