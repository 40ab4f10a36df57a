package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

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
    // the full native SQL function surface (shared with GraftSession.install)
    graft.expressions.Functions.all.foreach { case (name, clazz, builder) =>
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        builder,
      ))
    }
    // rank-filter → TopK pruning (strategy + optimizer rule)
    ext.injectPlannerStrategy(_ => TopKStrategy)
    ext.injectOptimizerRule(_ => RankFilterToTopK)
    // sorted-merge as-of join planning (AsOfMerge.join also self-installs)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
