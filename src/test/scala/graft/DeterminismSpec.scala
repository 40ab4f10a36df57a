package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Interpolate, Sessionize}

/** The engine's determinism guarantees: (a) results are bit-identical
  * under any partitioning (the decimal-aggregate policy, Num.scala),
  * verified by running oracle-backed queries under 2 vs 17 shuffle
  * partitions; (b) equal-timestamp rows must not make window-ordered
  * operators nondeterministic — with a tiebreak column the output is
  * identical across arbitrary repartitionings of the input. */
class DeterminismSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  // sorted multiset, not a Set: a partitioning-sensitive duplication bug
  // must not collapse away
  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("aggregate queries are bitwise partition-count invariant") {
    val names = Seq("q01_profile_stats", "q16_cumulative_snr", "q20_sigma_clip",
      "q38_cosine_topk", "q44_ivf_assign",
      // round-3 additions with their own shuffle topologies: binned
      // range join, broadcast-rate mixture sample, multi-distinct
      // profile, ranked-median MAD clip, global-heap heavy hitters
      "q56_range_join", "q57_mixture_sample", "q58_profile_columns",
      "q60_mad_clip", "q61_histogram", "q63_funnel", "q64_heavy_hitters",
      "q65_trend",
      // round-4 additions: TopKPerKey k=1 latest-snapshot, per-key lead
      // window SCD-2, bloom-prefilter + exact-verify decontamination,
      // full-outer RRF fusion over two retrievers, cohort-window retention
      "q67_latest_snapshot", "q68_scd2_intervals", "q69_decontaminate_bloom",
      "q70_hybrid_rrf", "q71_cohort_retention", "q72_zipf_slope", "q73_edit_verify",
      "q74_category_drift", "q75_cube", "q76_session_window", "q78_snapshot_diff",
      "q80_similarity_join", "q81_ntile_buckets", "q82_winsorize", "q83_top_contributor",
      // round-5: two-level prefix-sum interval aggregation (bin window +
      // single-partition bins-table window + final groupBy)
      "q88_interval_agg",
      // round-7: broadcast min/max + bit-interleave layout key, and the
      // incremental dedup's asymmetric band join + shared component graph
      "q110_zorder_code", "q113_dedup_incremental",
      // multi-plan Expand-style explode into one combine-keyed shuffle,
      // metric pivot, sign-bucket pair join + component resolution
      "q115_decimation_products", "q114_results_assemble",
      "q116_dedup_embeddings")
    val dir = "/root/testdata/sf0.001"
    names.foreach { name =>
      val fn = graft.queries.Queries.queryMap(name)
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      val a = rowsOf(fn(spark, dir))
      spark.conf.set("spark.sql.shuffle.partitions", "17")
      val b = rowsOf(fn(spark, dir))
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      assert(a == b, s"$name differs across partition counts")
    }
  }

  test("events loader works on a session without the nanos conf preset") {
    val fresh = spark.newSession()
    fresh.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    val df = graft.sources.Tables.events(fresh, "/root/testdata/sf0.001")
    assert(df.schema("ts").dataType.typeName == "timestamp")
    assert(df.count() > 0)
  }

  test("NTZ->UTC conversion is exact on non-UTC sessions, incl. the DST fall-back hour") {
    import org.apache.spark.sql.functions._
    val fresh = spark.newSession()
    fresh.conf.set("spark.sql.session.timeZone", "America/New_York")
    // 2025-11-02T06:30Z lands in New York's REPEATED 01:30 local hour: a
    // wall-clock round trip through the session zone is ambiguous there
    // and the old convert-then-cast path shifted it one hour early.
    val wallClocks = Seq(
      "2025-11-02 06:30:00",    // inside the fall-back ambiguity
      "2025-11-02 05:30:00",    // the EDT occurrence of the same local time
      "2025-03-09 07:30:00",    // spring-forward skipped local hour
      "2026-01-15 12:00:00.25", // fractional seconds, plain winter date
      "1969-12-31 23:59:59")    // pre-epoch
    val df = fresh.range(1).select(wallClocks.zipWithIndex.map { case (s, i) =>
      to_timestamp_ntz(lit(s)).as(s"t$i")
    }: _*)
    val got = df.select(wallClocks.indices.map(i =>
      graft.sources.Tables.ntzMicros(col(s"t$i")).as(s"m$i")): _*).head()
    wallClocks.zipWithIndex.foreach { case (s, i) =>
      val expected = java.time.LocalDateTime.parse(s.replace(" ", "T"))
        .toInstant(java.time.ZoneOffset.UTC)
      val us = expected.getEpochSecond * 1000000L + expected.getNano / 1000L
      assert(got.getLong(i) === us, s"$s converted wrong on a non-UTC session")
    }
    // and the SQL-string form (Tables.events NTZ branch) agrees
    val viaSql = df.select(expr(graft.sources.Tables.ntzToUtcTimestamp
      .replaceAll("\\bts\\b", "t0")).cast("long")).head().getLong(0)
    val e0 = java.time.LocalDateTime.parse(wallClocks.head.replace(" ", "T"))
      .toInstant(java.time.ZoneOffset.UTC).getEpochSecond
    assert(viaSql === e0, "SQL-form NTZ conversion shifted in the fall-back hour")
  }

  // Three rows share one timestamp; values differ so neighbor picks and
  // lag() results depend on intra-ts order.
  private def dupTsDf = Seq(
    (1L, t("2024-01-01 10:00:00"), 100L, 1.0, false),
    (1L, t("2024-01-01 10:30:00"), 101L, 0.0, true),
    (1L, t("2024-01-01 10:30:00"), 102L, 2.0, false),
    (1L, t("2024-01-01 10:30:00"), 103L, 4.0, false),
    (1L, t("2024-01-01 11:30:00"), 104L, 8.0, false),
  ).toDF("k", "ts", "event_id", "v", "miss")

  test("Sessionize with tiebreak is stable under repartitioning") {
    val runs = Seq(1, 3, 7).map { n =>
      Sessionize.withSessionIds(dupTsDf.repartition(n), "k", "ts",
          gapSeconds = 1800L, tiebreak = Seq("event_id"))
        .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    }
    assert(runs.distinct.size == 1)
    // Ties (equal ts) have zero gap so they never split a session.
    assert(runs.head == Map(100L -> 0L, 101L -> 0L, 102L -> 0L, 103L -> 0L, 104L -> 1L))
  }

  test("Interpolate with tiebreak is stable under repartitioning") {
    val runs = Seq(1, 3, 7).map { n =>
      Interpolate.refillLinear(dupTsDf.repartition(n), "k", "ts", "v",
          col("miss"), tiebreak = Seq("event_id"))
        .select("event_id", "refilled").as[(Long, Double)].collect().toMap
    }
    assert(runs.distinct.size == 1)
    // Missing row 101 sits between good neighbors 100 (1.0) and 102 (2.0).
    assert(runs.head(101L) == 1.5)
  }

  test("hashGaussian planes are engine-portable: md5 Box-Muller matches independent references") {
    import graft.functions.VectorFns
    // reference values computed INDEPENDENTLY (python hashlib/struct/math
    // and DuckDB md5 + ln/cos agree on these to the printed digit) — a
    // pin against the exact md5-slicing convention: big-endian first/
    // second 8 bytes, top-53-bit uniforms, u1 = (x+1)/2^53 so ln stays
    // finite, z = sqrt(-2 ln u1) * cos(2 pi u2)
    assert(math.abs(VectorFns.hashGaussian("graft-plane:1:0:0") - 0.9445090726019857) < 1e-12)
    // pure function of the tag: stable across calls, distinct across tags
    assert(VectorFns.hashGaussian("graft-plane:1:0:0")
      === VectorFns.hashGaussian("graft-plane:1:0:0"))
    val draws = (0 until 256).map(j => VectorFns.hashGaussian(s"graft-plane:2:1:$j"))
    assert(draws.distinct.size === 256)
    // roughly standard normal: mean ~0, sd ~1 (loose sanity bounds)
    val mean = draws.sum / draws.size
    val sd = math.sqrt(draws.map(d => (d - mean) * (d - mean)).sum / draws.size)
    assert(math.abs(mean) < 0.2 && sd > 0.8 && sd < 1.2, s"mean=$mean sd=$sd")
  }
}
