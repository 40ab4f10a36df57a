package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.expressions.KeplerSolve

/** SparkSessionExtensions entry point: registers graft's native
  * expressions so SQL users get them on session start:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   ...
  * }}}
  *
  * or `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("kepler_solve"),
      new ExpressionInfo(classOf[KeplerSolve].getName, "kepler_solve"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        KeplerSolve.coerced(exprs.head, exprs(1)),
    ))
    // rank-filter → TopK pruning (strategy + optimizer rule)
    ext.injectPlannerStrategy(_ => TopKStrategy)
    ext.injectOptimizerRule(_ => RankFilterToTopK)
    // sorted-merge as-of join planning (AsOfMerge.join also self-installs)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
