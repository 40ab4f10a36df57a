package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // Deterministic pseudo-random data spanning negative values and
  // intervals from sub-bin to many-bin widths.
  private def points: DataFrame = (0 until 400).map { i =>
    (i.toLong, (i * 7919 % 2003) - 1000L, s"k${i % 3}")
  }.toDF("p_id", "p", "pk")

  private def intervals: DataFrame = (0 until 120).map { i =>
    val s = (i * 6101 % 1997) - 990L
    (i.toLong, s, s + (i * 131 % 400), s"k${i % 3}")
  }.toDF("i_id", "s", "e", "ik")

  private def naivePairs(extraKey: Boolean): Set[(Long, Long)] = {
    val cond = if (extraKey) col("p").between(col("s"), col("e")) && col("pk") === col("ik")
    else col("p").between(col("s"), col("e"))
    points.crossJoin(intervals).filter(cond)
      .select("p_id", "i_id").as[(Long, Long)].collect().toSet
  }

  test("pointInInterval matches the naive cross-join across bin widths") {
    for (w <- Seq(1L, 7L, 100L, 5000L)) {
      val got = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", binWidth = w)
        .select("p_id", "i_id").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"duplicate pairs at binWidth=$w")
      assert(got.toSet == naivePairs(extraKey = false), s"binWidth=$w")
    }
  }

  test("pointInInterval honors extra equi-keys") {
    val got = RangeJoin.pointInInterval(points, intervals, "p", "s", "e",
        binWidth = 50, extraKeys = Seq("pk" -> "ik"))
      .select("p_id", "i_id").as[(Long, Long)].collect().toSet
    assert(got == naivePairs(extraKey = true))
  }

  test("pointInInterval drops empty (end < start) intervals instead of mis-binning") {
    val iv = Seq((1L, 10L, 5L), (2L, 0L, 20L)).toDF("i_id", "s", "e")
    val pts = Seq((1L, 7L)).toDF("p_id", "p")
    val got = RangeJoin.pointInInterval(pts, iv, "p", "s", "e", binWidth = 4)
      .select("i_id").as[Long].collect().toSeq
    assert(got == Seq(2L))
  }

  test("overlap matches the naive cross-join and dedupes multi-bin meetings") {
    val l = (0 until 80).map { i =>
      val s = (i * 977 % 499) - 250L
      (i.toLong, s, s + (i * 37 % 120))
    }.toDF("l_id", "ls", "le")
    val r = (0 until 80).map { i =>
      val s = (i * 733 % 503) - 240L
      (i.toLong, s, s + (i * 53 % 90))
    }.toDF("r_id", "rs", "re")
    val naive = l.crossJoin(r)
      .filter(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    for (w <- Seq(3L, 32L, 1000L)) {
      val got = RangeJoin.overlap(l, r, "ls", "le", "rs", "re", binWidth = w)
        .select("l_id", "r_id").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"duplicate pairs at binWidth=$w")
      assert(got.toSet == naive, s"binWidth=$w")
    }
  }

  test("pointInInterval bins timestamp columns on unix_micros") {
    val pts = Seq((1L, "2024-01-05 12:00:00"), (2L, "2024-02-01 00:00:00"))
      .toDF("p_id", "t").withColumn("t", col("t").cast("timestamp"))
    val iv = Seq((10L, "2024-01-01 00:00:00", "2024-01-10 00:00:00"))
      .toDF("i_id", "s", "e")
      .withColumn("s", col("s").cast("timestamp"))
      .withColumn("e", col("e").cast("timestamp"))
    val got = RangeJoin.pointInInterval(pts, iv, "t", "s", "e",
        binWidth = 86400L * 1000000L) // 1-day bins, micros
      .select("p_id").as[Long].collect().toSeq
    assert(got == Seq(1L))
  }

  test("aggregatePointsInIntervals matches pair-join + groupBy across bin widths") {
    // value column with nulls (sum must skip them, like the pair join's)
    val pts = points.withColumn("v",
      when(col("p_id") % 7 === 0, lit(null)).otherwise(col("p_id") * 3 + 1))
    val expected = pts.crossJoin(intervals)
      .filter(col("p").between(col("s"), col("e")))
      .groupBy("i_id")
      .agg(count(lit(1)).as("n_pairs"), sum("v").as("sum_v"))
      .as[(Long, Long, Long)].collect().toSet
    for (w <- Seq(1L, 7L, 100L, 5000L)) {
      val got = RangeJoin.aggregatePointsInIntervals(
          pts, intervals, "p", "s", "e", binWidth = w,
          groupKeys = Seq("i_id"), sumCols = Seq("v"))
        .as[(Long, Long, Long)].collect()
      assert(got.length == got.toSet.size, s"duplicate groups at binWidth=$w")
      assert(got.toSet == expected, s"binWidth=$w")
    }
  }

  test("aggregatePointsInIntervals drops zero-match groups and empty intervals") {
    val pts = Seq((1L, 7L)).toDF("p_id", "p")
    val iv = Seq((1L, 10L, 5L), (2L, 0L, 20L), (3L, 100L, 200L)).toDF("i_id", "s", "e")
    val got = RangeJoin.aggregatePointsInIntervals(
        pts, iv, "p", "s", "e", binWidth = 4, groupKeys = Seq("i_id"))
      .select("i_id", "n_pairs").as[(Long, Long)].collect().toSeq
    assert(got == Seq((2L, 1L)))
  }

  test("aggregatePointsInIntervals closed-boundary inclusivity at bin edges") {
    // points exactly on start/end, boundaries exactly on bin edges
    val pts = Seq((1L, 0L), (2L, 4L), (3L, 8L), (4L, 9L)).toDF("p_id", "p")
    val iv = Seq((1L, 0L, 8L), (2L, 4L, 4L)).toDF("i_id", "s", "e")
    val got = RangeJoin.aggregatePointsInIntervals(
        pts, iv, "p", "s", "e", binWidth = 4, groupKeys = Seq("i_id"))
      .select("i_id", "n_pairs").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 1L))
  }

  test("pairBudget: planted dense axis fails loudly naming the bin; under-budget is a no-op") {
    // 60 points × 50 intervals all landing in bin 0 → 3000 candidate pairs
    val densePts = (0 until 60).map(i => (i.toLong, i.toLong % 10)).toDF("p_id", "p")
    val denseIvs = (0 until 50).map(i => (i.toLong, 0L, 9L)).toDF("i_id", "s", "e")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(densePts, denseIvs, "p", "s", "e",
        binWidth = 100, pairBudget = Some(2999L)).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(m => m.contains("pairBudget=2999") && m.contains("bin 0")
      && m.contains("60 points x 50 intervals")), s"got: ${messages(ex)}")
    // at the budget exactly: passes, and the output is identical to unguarded
    val guarded = RangeJoin.pointInInterval(points, intervals, "p", "s", "e",
        binWidth = 100, pairBudget = Some(1000000L))
      .select("p_id", "i_id").as[(Long, Long)].collect().toSet
    assert(guarded == naivePairs(extraKey = false))
    // extra keys partition the budget: per-(bin, key) products, not per-bin
    val keyed = RangeJoin.pointInInterval(points, intervals, "p", "s", "e",
        binWidth = 50, extraKeys = Seq("pk" -> "ik"), pairBudget = Some(1000000L))
      .select("p_id", "i_id").as[(Long, Long)].collect().toSet
    assert(keyed == naivePairs(extraKey = true))
  }

  test("pairBudget bounds the TOTAL across bins: no single bin over, sum over") {
    // 10 bins, each 20 points x 20 intervals = 400 pairs/bin — every bin
    // under a 500 budget, but the 4000-pair total is not: the round-11
    // total-sum branch must fire with the total/bin-count message
    val pts = (0 until 200).map(i => (i.toLong, (i % 10) * 100L + i % 20)).toDF("p_id", "p")
    val ivs = (0 until 200).map(i => (i.toLong, (i % 10) * 100L, (i % 10) * 100L + 99L))
      .toDF("i_id", "s", "e")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(pts, ivs, "p", "s", "e",
        binWidth = 100, pairBudget = Some(500L)).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(m => m.contains("4000 total candidate pairs")
      && m.contains("10 bins") && m.contains("pairBudget=500")
      && m.contains("worst bin")), s"got: ${messages(ex)}")
    // the same data passes at a budget >= the total, output unchanged
    val ok = RangeJoin.pointInInterval(pts, ivs, "p", "s", "e",
        binWidth = 100, pairBudget = Some(4000L))
      .select("p_id", "i_id").count()
    assert(ok === 4000L)
  }

  test("pairBudget guard stays off the per-pair hot path (1-row broadcast side)") {
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    val df = RangeJoin.pointInInterval(points, intervals, "p", "s", "e",
      binWidth = 100, pairBudget = Some(1000000L))
    val plan = df.queryExecution.sparkPlan
    val guards = plan.collect {
      case f: FilterExec if f.condition.toString.contains("raise_error") => f }
    assert(guards.size == 1, s"exactly one guard filter, got ${guards.size}")
    // the guard filters the ONE-row global aggregate, never the pair stream
    val child = guards.head.child
    assert(child.isInstanceOf[HashAggregateExec] || child.isInstanceOf[ObjectHashAggregateExec]
      || child.isInstanceOf[SortAggregateExec],
      s"guard must sit on the 1-row aggregate, found child ${child.getClass.getSimpleName}")
    // and disabling the budget leaves the plan free of any guard machinery
    val off = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", binWidth = 100)
    assert(!off.queryExecution.sparkPlan.toString.contains("raise_error"))
  }

  test("range join plans an equi-join, not BroadcastNestedLoopJoin") {
    val df = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", binWidth = 100)
    val bnl = df.queryExecution.sparkPlan.collect { case b: BroadcastNestedLoopJoinExec => b }
    assert(bnl.isEmpty, "bin-equi-join must not degrade to a nested-loop join")
  }
}
