package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, CurrentRow, EqualTo, ExprId, Expression, LessThan, LessThanOrEqual, Literal, RowFrame, RowNumber, SpecifiedWindowFrame, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Catalyst optimizer rule: recognize the `row_number() over (partition by
  * … order by …) <= k` idiom and prune through the TopKPerKey operator.
  *
  * The Window node is KEPT (it recomputes the rank over the ≤ k·keys
  * surviving rows, so the output schema and values are untouched); the
  * TopKPerKeyPlan inserted *below* it discards everything that can't pass
  * the rank filter before the window's sort — turning a full per-key sort
  * of n rows into bounded heaps + a sort of k·keys rows.
  *
  * Same determinism caveat as row_number itself: with a non-total sort
  * order, tied rows at the cut are chosen arbitrarily (by either plan).
  */
object RankFilterToTopK extends Rule[LogicalPlan] {

  /** Heap memory guard: skip the rewrite for huge k. */
  private val MaxK = 10000

  private def rowNumberId(w: Window): Option[ExprId] = w.windowExpressions match {
    case Seq(a @ Alias(WindowExpression(_: RowNumber,
        WindowSpecDefinition(_, _, SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)) =>
      Some(a.exprId)
    case _ => None
  }

  private def limitFromCond(cond: Expression, rnId: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType)) if a.exprId == rnId => Some(k)
    case LessThan(a: AttributeReference, Literal(k: Int, IntegerType)) if a.exprId == rnId => Some(k - 1)
    case EqualTo(a: AttributeReference, Literal(k: Int, IntegerType)) if a.exprId == rnId && k == 1 => Some(1)
    case _ => None
  }

  private def pruned(w: Window, k: Int): Option[LogicalPlan] =
    if (w.partitionSpec.isEmpty || w.child.isInstanceOf[TopKPerKeyPlan] || k > MaxK || k < 1) None
    else Some(w.withNewChildren(Seq(TopKPerKeyPlan(w.partitionSpec, w.orderSpec, k, w.child))))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      (for {
        rnId <- rowNumberId(w)
        k <- limitFromCond(cond, rnId)
        nw <- pruned(w, k)
      } yield f.copy(child = nw)).getOrElse(f)

    case f @ Filter(cond, p @ Project(_, w: Window)) =>
      (for {
        rnId <- rowNumberId(w)
        k <- limitFromCond(cond, rnId)
        nw <- pruned(w, k)
      } yield f.copy(child = p.copy(child = nw))).getOrElse(f)
  }
}

object RankFilterToTopK_Install {
  /** Install rule + planning strategy on a live session. */
  def apply(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(RankFilterToTopK)) {
      spark.experimental.extraOptimizations = spark.experimental.extraOptimizations :+ RankFilterToTopK
    }
  }
}
