package graft

import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

import graft.plans.{AsOfJoinMergeExec, TopKPerKeyExec}
import graft.queries.Queries

/** Plan-shape regression guards for the most expensive catalog queries:
  * the invariants PLANS.md documents, asserted so a future rewrite can't
  * silently regress them. sparkPlan (not executedPlan) — AQE wraps the
  * unexecuted tree and `collect` over it would pass vacuously. */
class PlanGuardSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def sparkPlan(name: String): SparkPlan =
    Queries.queryMap(name)(spark, dir).queryExecution.sparkPlan

  test("q80 similarity join: prefix-filtered shuffle joins, never a nested-loop/cartesian plan") {
    val sp = sparkPlan("q80_similarity_join")
    assert(sp.collect { case e: BroadcastNestedLoopJoinExec => e }.isEmpty,
      "q80 must not plan BroadcastNestedLoopJoin")
    assert(sp.collect { case e: CartesianProductExec => e }.isEmpty,
      "q80 must not plan a cartesian product")
  }

  test("q38/q39/q46 top-k: exactly one pruning mechanism (TopKPerKey), window rewritten away") {
    for (q <- Seq("q38_cosine_topk", "q39_ann_buckets", "q46_ivf_search")) {
      val sp = sparkPlan(q)
      assert(sp.collect { case e: TopKPerKeyExec => e }.nonEmpty,
        s"$q: expected the rank-filter → TopKPerKey rewrite to fire")
      assert(sp.collect { case e: WindowExec => e }.isEmpty,
        s"$q: WindowExec must be replaced, not kept above TopKPerKey")
      assert(sp.collect { case e: WindowGroupLimitExec => e }.isEmpty,
        s"$q: built-in group-limit pruning must not stack on TopKPerKey")
    }
  }

  test("q22 as-of join: custom sorted-merge exec, no sorts beyond the per-side merge order") {
    val sp = sparkPlan("q22_asof_join")
    assert(sp.collect { case e: AsOfJoinMergeExec => e }.nonEmpty,
      "q22 must plan AsOfJoinMergeExec")
    val sorts = sp.collect { case e: SortExec => e }
    assert(sorts.size <= 2,
      s"at most one EnsureRequirements sort per merge side, got ${sorts.size}")
  }

  test("q47 dedup clusters: returned plan reads checkpointed round state, not round replay") {
    // the min-label resolution runs eagerly inside the build; the
    // DataFrame it returns must scan materialized cluster labels — the
    // localCheckpoint blocks (LogicalRDD) of the distributed loop, or the
    // LocalRelation of the driver union-find path — instead of carrying
    // the whole per-round lineage
    val df = Queries.queryMap("q47_dedup_clusters")(spark, dir)
    val rdds = df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    assert(rdds.nonEmpty, "q47 lineage must be truncated (checkpoint blocks or a local label relation)")
  }

  test("q04 dimension rollup: dims broadcast, never shuffled") {
    val sp = sparkPlan("q04_dim_rollup")
    assert(sp.collect { case e: BroadcastHashJoinExec => e }.nonEmpty,
      "q04's dimension joins must plan BroadcastHashJoin")
  }

  test("q56 range join: pairBudget guard rides a 1-row side, off the per-pair hot path") {
    import org.apache.spark.sql.execution.FilterExec
    val sp = sparkPlan("q56_range_join")
    val guards = sp.collect {
      case f: FilterExec if f.condition.toString.contains("raise_error") => f }
    assert(guards.size == 1, "q56 must carry exactly one pairBudget guard filter")
    // the guard's subtree must be the count-aggregate side: if a rewrite
    // ever slid the raise_error onto the pair stream, the filter's child
    // would be the bin join, not an aggregate (the q121 scan-fusion lesson)
    val agg = guards.head.child
    assert(agg.isInstanceOf[org.apache.spark.sql.execution.aggregate.HashAggregateExec]
      || agg.isInstanceOf[org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec]
      || agg.isInstanceOf[org.apache.spark.sql.execution.aggregate.SortAggregateExec],
      s"guard child must be the 1-row aggregate, got ${agg.getClass.getSimpleName}")
  }

  test("q99/q102 sequence packing: every window is group-partitioned, no global sort") {
    for (q <- Seq("q99_pack_sequences", "q102_pack_rows")) {
      val sp = sparkPlan(q)
      val windows = sp.collect { case e: WindowExec => e }
      assert(windows.nonEmpty, s"$q: expected the running-offset window")
      windows.foreach { w =>
        assert(w.partitionSpec.nonEmpty,
          s"$q: a window without partitioning would serialize the whole corpus on one task")
      }
      assert(sp.collect { case e: CartesianProductExec => e }.isEmpty,
        s"$q must not plan a cartesian product")
    }
  }

  test("q100 weighted sample: bounded-heap TopKPerKey, no per-group window sort") {
    val sp = sparkPlan("q100_weighted_sample")
    assert(sp.collect { case e: TopKPerKeyExec => e }.nonEmpty,
      "q100 must ride TopKPerKey (map-side partial heaps)")
    assert(sp.collect { case e: WindowExec => e }.isEmpty,
      "q100 must not fall back to a full per-group window sort")
  }

  test("fact-fact skew: AQE skew-join split fires on a planted hot key (SURVEY §5)") {
    // SURVEY §5 claims "fact-fact joins shuffle on join keys with AQE
    // skew handling" — this pins the wiring: a hot key big enough to
    // trip the (test-lowered) skew thresholds must show the split
    // marker in the FINAL adaptive plan. An isolated newSession keeps
    // the lowered thresholds away from concurrently-running suites;
    // production sizes differ only in the threshold constants, which
    // are size policy, not mechanism.
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import s.implicits._
    import org.apache.spark.sql.functions.{concat, lit, lpad, when}
    // key 0 holds 50k of 60k rows with a ~200 B payload (~10 MB in one
    // shuffle partition vs kB-sized siblings); 200 cold keys around it
    val left = s.range(0, 60000).select(
      when($"id" < 50000, 0L).otherwise($"id" % 200 + 1).as("k"),
      concat(lit("x"), lpad($"id".cast("string"), 200, "p")).as("pay"))
    val right = s.range(0, 201).select($"id".as("k"), lit(1).as("v"))
    val j = left.join(right, "k")
    // execute THIS dataset (count() would spawn its own QueryExecution
    // and leave j's adaptive plan unfinalized)
    assert(j.collect().length === 60000)
    val planStr = j.queryExecution.executedPlan.toString
    assert(planStr.contains("skew=true") || planStr.contains("skewed"),
      s"expected the AQE skew-split marker in the final adaptive plan:\n$planStr")
  }

  test("autoSalted: hot keys ride the salted branch, cold keys the plain join") {
    import spark.implicits._
    val left = (Seq.fill(500)(("hot", 1)) ++ (1 to 50).map(i => (s"c$i", i)))
      .toDF("k", "payload")
    val right = (Seq(("hot", 9)) ++ (1 to 50).map(i => (s"c$i", -i))).toDF("k", "v")
    val routed = graft.operators.SkewJoin.autoSalted(
      left, right, "k", scatterCol = "payload", saltBuckets = 8, heavyThreshold = 100L)
    // semantics: identical to the plain join
    val plain = left.join(right, "k")
    assert(routed.count() === plain.count())
    assert(routed.select("k", "payload", "v").except(plain.select("k", "payload", "v")).isEmpty)
    // plan: the salted branch (right side exploded across salt buckets)
    // AND the zero-replication plain branch both present under the union
    val planStr = routed.queryExecution.sparkPlan.toString
    assert(planStr.toLowerCase.contains("union"), "routing must union the two branches")
    assert(planStr.contains("explode") || planStr.contains("Generate"),
      "the hot branch must scatter via the exploded salt sequence")
  }

  test("q113 incremental dedup: band-keyed joins only, candidate keys read from checkpoint") {
    val sp = sparkPlan("q113_dedup_incremental")
    assert(sp.collect { case e: BroadcastNestedLoopJoinExec => e }.isEmpty,
      "q113 must not plan BroadcastNestedLoopJoin")
    assert(sp.collect { case e: CartesianProductExec => e }.isEmpty,
      "q113 must not plan a cartesian product")
    // the batch's band keys are computed ONCE and checkpointed; both the
    // asymmetric and the self candidate join must read the scan, not
    // replay the shingle+minhash map stage
    assert(sp.toString.contains("ExistingRDD") || sp.toString.contains("Scan ExistingRDD"),
      "q113 candidate joins must read the checkpointed band keys")
  }
}
