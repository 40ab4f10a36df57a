package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType}

/** Packs a (score: double, label: int) pair into ONE long whose SIGNED
  * ordering equals the lexicographic (score, label) ordering — so an
  * argmax-by-score-then-label becomes a plain `max(long)` aggregate.
  *
  * Why: `max(struct(score, label))` has a struct aggregation buffer, which
  * is not UnsafeRow-mutable, so Spark plans SortAggregate — a per-partition
  * sort of the full candidate set. A long buffer is hash-aggregable:
  * HashAggregate, no sort, same one-row-per-key shuffle.
  *
  * Encoding: IEEE-754 bits of the score, sign-flipped into a total order
  * (the standard sortable-double transform), with the low `labelBits`
  * mantissa bits replaced by the label. Scores whose difference is below
  * ~2^-(52-labelBits) relative (≈ 4e-15 at labelBits = 4, ≈ 5e-7 at the
  * 31-bit ceiling — still far below any meaningful cosine/score gap)
  * collapse to a tie broken by the larger label; EXACT score ties break
  * by larger label, matching `ORDER BY score DESC, label DESC`
  * semantics. The winning score itself is NOT recoverable from the
  * packed value (low bits hold the label) — pair with `max(score)`,
  * which is the same row's score.
  *
  * Labels must be in [0, 2^labelBits); out-of-range labels throw (a
  * silently-masked label would return a wrong argmax). labelBits caps at
  * 31 — the label input is an Int, and scale paths that need k ∝ n label
  * spaces ([[graft.operators.Dedup.assignNearestTwoLevel]]) auto-size
  * bits to the codebook, reaching 2^31 labels before this encoding needs
  * a wider carrier.
  */
case class ArgMaxPack(left: Expression, right: Expression, labelBits: Int)
    extends BinaryExpression {

  require(labelBits >= 1 && labelBits <= 31, s"labelBits must be in [1,31], got $labelBits")

  override def dataType: DataType = LongType
  override def prettyName: String = "argmax_pack"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == IntegerType) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, int) inputs, got ${left.dataType} / ${right.dataType}")
    }

  override protected def nullSafeEval(s: Any, l: Any): Any =
    ArgMaxMath.pack(s.asInstanceOf[Double], l.asInstanceOf[Int], labelBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, l) => {
      s"${ev.value} = graft.expressions.ArgMaxMath$$.MODULE$$.pack($s, $l, $labelBits);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ArgMaxPack =
    copy(left = newLeft, right = newRight)
}

object ArgMaxMath {
  def pack(score: Double, label: Int, labelBits: Int): Long = {
    val mask = (1L << labelBits) - 1L
    if (label < 0 || label > mask) {
      throw new IllegalArgumentException(
        s"argmax_pack label $label outside [0, ${mask + 1}) for labelBits=$labelBits")
    }
    val bits = java.lang.Double.doubleToLongBits(score)
    val sortable = bits ^ ((bits >> 63) & 0x7fffffffffffffffL)
    (sortable & ~mask) | label.toLong
  }
}

object ArgMaxPack {
  /** Column-API entry: `max(ArgMaxPack.of(score, label, bits))` then
    * [[unpackLabel]] on the aggregate. */
  def of(score: Column, label: Column, labelBits: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(ArgMaxPack(
      org.apache.spark.sql.graft.Bridge.expression(score),
      org.apache.spark.sql.graft.Bridge.expression(label),
      labelBits))

  /** The label back out of a packed (or max-of-packed) value. */
  def unpackLabel(packed: Column, labelBits: Int): Column =
    packed.bitwiseAND(org.apache.spark.sql.functions.lit((1L << labelBits) - 1L)).cast("int")
}
