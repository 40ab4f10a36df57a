package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, CurrentRow, EqualTo, ExprId, Expression, LessThan, LessThanOrEqual, Literal, PredicateHelper, RowFrame, RowNumber, SpecifiedWindowFrame, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Catalyst optimizer rule: recognize the `row_number() over (partition by
  * … order by …) <= k` idiom and REPLACE the Filter+Window pair with the
  * TopKPerKey operator, which emits the rank itself (same ExprId, so parent
  * plans resolve unchanged).
  *
  * Replacing — rather than pruning below — matters twice over: the Window
  * would re-sort every surviving partition just to recompute ranks the heap
  * already knows, and Spark ≥3.5's built-in InferWindowGroupLimit has
  * usually ALREADY inserted its own pruning (a WindowGroupLimit + full
  * map-side Sort) by the time user rules run, so keeping the Window meant
  * two redundant pruning passes and a sort. The rewrite strips that
  * WindowGroupLimit too; the final plan is the same clean
  * `TopKPerKey(partial) → Exchange → TopKPerKey(final)` as the direct
  * TopK.perKey path, with zero sorts.
  *
  * Same determinism caveat as row_number itself: with a non-total sort
  * order, tied rows at the cut are chosen arbitrarily (by either plan).
  */
object RankFilterToTopK extends Rule[LogicalPlan] with PredicateHelper {

  /** Heap memory guard: skip the rewrite for huge k. */
  private val MaxK = 10000

  private def rowNumberAlias(w: Window): Option[Alias] = w.windowExpressions match {
    case Seq(a @ Alias(WindowExpression(_: RowNumber,
        WindowSpecDefinition(_, _, SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)) =>
      Some(a)
    case _ => None
  }

  /** One conjunct → (heap limit, keep-as-residual). `rn = k` for k > 1
    * bounds the heap at k but must still be re-applied above. */
  private def limitOf(cond: Expression, rnId: ExprId): Option[(Int, Boolean)] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType)) if a.exprId == rnId => Some((k, false))
    case LessThan(a: AttributeReference, Literal(k: Int, IntegerType)) if a.exprId == rnId => Some((k - 1, false))
    case EqualTo(a: AttributeReference, Literal(k: Int, IntegerType)) if a.exprId == rnId => Some((k, k != 1))
    case _ => None
  }

  /** Split a possibly-conjunctive filter (optimizers infer extra conjuncts
    * like `isnotnull(join_key)` onto rank filters) into the tightest rank
    * limit plus the residual conjuncts to re-apply above the TopK node.
    * Residuals may even reference the rank — TopKPerKey emits it. */
  private def extract(cond: Expression, rnId: ExprId): Option[(Int, Seq[Expression])] = {
    val matched = splitConjunctivePredicates(cond).map(c => c -> limitOf(c, rnId))
    val ks = matched.collect { case (_, Some((k, _))) => k }
    if (ks.isEmpty) None
    else Some((ks.min, matched.collect {
      case (c, None) => c
      case (c, Some((_, true))) => c
    }))
  }

  /** The TopKPerKeyPlan that replaces Filter(rank ≤ k, Window(row_number)).
    * Any WindowGroupLimit the built-in InferWindowGroupLimit rule slid
    * under the Window is stripped — it was derived from the same filter,
    * and TopKPerKey enforces the exact limit itself. */
  private def replacement(w: Window, k: Int, rn: Alias): Option[LogicalPlan] = {
    val child = w.child match {
      case wgl: WindowGroupLimit => wgl.child
      case c => c
    }
    if (w.partitionSpec.isEmpty || child.isInstanceOf[TopKPerKeyPlan] || k > MaxK || k < 1) None
    else {
      val rankAttr = AttributeReference(rn.name, IntegerType, nullable = false)(exprId = rn.exprId)
      Some(TopKPerKeyPlan(w.partitionSpec, w.orderSpec, k, child, Some(rankAttr)))
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      (for {
        rn <- rowNumberAlias(w)
        kr <- extract(cond, rn.exprId)
        topk <- replacement(w, kr._1, rn)
      } yield kr._2.reduceOption(And).map(Filter(_, topk)).getOrElse(topk)).getOrElse(f)

    case f @ Filter(cond, p @ Project(_, w: Window)) =>
      (for {
        rn <- rowNumberAlias(w)
        kr <- extract(cond, rn.exprId)
        topk <- replacement(w, kr._1, rn)
      } yield {
        val pruned = p.copy(child = topk)
        kr._2.reduceOption(And).map(Filter(_, pruned)).getOrElse(pruned)
      }).getOrElse(f)
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
