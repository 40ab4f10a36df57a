package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.{RankFilterToTopK_Install, TopKPerKeyExec}

class RankRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def sample = (1 to 400).map { i =>
    (s"g${i % 5}", i.toLong, (i * 53 % 97).toDouble)
  }.toDF("g", "id", "score")

  test("rank filter rewrites to TopK pruning below the window, results unchanged") {
    // Other suites (KnnJoin, GraftSession) self-install the rule on the
    // shared session; remove it so the "before" plan is rule-free.
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == graft.plans.RankFilterToTopK)
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val query = sample.withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)

    val before = query.as[(String, Long, Double, Int)].collect().toSet
    assert(query.queryExecution.sparkPlan.collect { case e: TopKPerKeyExec => e }.isEmpty)

    RankFilterToTopK_Install(spark)
    try {
      val rewritten = sample.withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
      val execs = rewritten.queryExecution.sparkPlan.collect { case e: TopKPerKeyExec => e }
      assert(execs.nonEmpty, "expected TopKPerKeyExec after rewrite")
      // the Window (and Spark's own WindowGroupLimit pruning) must be GONE:
      // TopKPerKey replaces them and emits the rank itself — exactly one
      // pruning mechanism, no per-key sort of the candidate set.
      // sparkPlan, not executedPlan: AQE wraps the unexecuted tree and
      // collect() would pass vacuously
      val sp = rewritten.queryExecution.sparkPlan
      assert(sp.collect { case e: org.apache.spark.sql.execution.window.WindowExec => e }.isEmpty,
        "Window must be replaced, not kept above TopKPerKey")
      assert(sp.collect { case e: org.apache.spark.sql.execution.window.WindowGroupLimitExec => e }.isEmpty,
        "built-in WindowGroupLimit pruning must not stack on TopKPerKey")
      assert(sp.collect { case e: org.apache.spark.sql.execution.SortExec => e }.isEmpty,
        "no full map-side sort of the candidate set")
      // rank column survives and values are identical
      assert(rewritten.as[(String, Long, Double, Int)].collect().toSet == before)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == graft.plans.RankFilterToTopK)
    }
  }

  test("rewrite leaves non-matching filters and global windows alone") {
    RankFilterToTopK_Install(spark)
    try {
      val wGlobal = Window.orderBy(col("id"))
      val q1 = sample.withColumn("rn", row_number().over(wGlobal)).filter(col("rn") <= 4)
      assert(q1.queryExecution.sparkPlan.collect { case e: TopKPerKeyExec => e }.isEmpty)

      val w = Window.partitionBy("g").orderBy(col("id"))
      val q2 = sample.withColumn("rn", row_number().over(w)).filter(col("rn") >= 4)
      assert(q2.queryExecution.sparkPlan.collect { case e: TopKPerKeyExec => e }.isEmpty)
      assert(q2.count() > 0)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == graft.plans.RankFilterToTopK)
    }
  }
}
