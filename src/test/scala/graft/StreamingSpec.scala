package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStream
import graft.streaming.EventStream.{Event, SessionOut}

/** Top-level so spark.implicits can derive its encoder (local case
  * classes carry no TypeTag). */
case class StreamVec(vec_id: Long, ts: Timestamp, embedding: Seq[Float])

class StreamingSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("windowedStats aggregates per window+type under a watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, t("2024-01-01 10:01:00"), 1, "click", 1.0),
      Event(2, t("2024-01-01 10:02:00"), 1, "click", 2.0),
      Event(3, t("2024-01-01 10:03:00"), 2, "view", 5.0),
    )
    val q = EventStream.windowedStats(mem.toDF(), "10 minutes", "10 minutes")
      .writeStream.format("memory").queryName("win_out").outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_type, n, sum_value FROM win_out")
        .as[(String, Long, Double)].collect().toSet
      assert(rows == Set(("click", 2L, 3.0), ("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("windowedTrend recovers a planted linear drift per key and window") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    // key "a": value = 100 + 2·(seconds into the 10-min window);
    // key "b": constant (slope 0); key "c": one event (degenerate)
    val events = (0 until 5).flatMap { i =>
      val ts = t(f"2024-01-01 10:0$i:00")
      Seq(Event(i * 10L, ts, 1, "a", 100.0 + 2.0 * (60.0 * i)),
          Event(i * 10L + 1, ts, 2, "b", 7.5))
    } ++ Seq(
      Event(99L, t("2024-01-01 10:02:30"), 3, "c", 1.0),
      // key "d": n = 3 but ONE distinct timestamp — the FP-degenerate
      // case where n·Σx² − (Σx)² is rounding dust, not exact zero; the
      // structural min==max guard must null it, not emit tiny/tiny
      Event(100L, t("2024-01-01 10:03:20"), 4, "d", 1.0),
      Event(101L, t("2024-01-01 10:03:20"), 4, "d", 2.0),
      Event(102L, t("2024-01-01 10:03:20"), 4, "d", 4.0))
    mem.addData(events: _*)
    val q = EventStream.windowedTrend(mem.toDF(), "event_type", "value",
        windowSeconds = 600L)
      .writeStream.format("memory").queryName("trend_out")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val rows = spark.sql(
          "SELECT event_type, n, slope_per_sec, intercept_at_start FROM trend_out")
        .collect().map(r => r.getString(0) -> r).toMap
      val a = rows("a")
      assert(a.getLong(1) === 5L)
      assert(math.abs(a.getDouble(2) - 2.0) < 1e-9, s"slope ${a.getDouble(2)}")
      assert(math.abs(a.getDouble(3) - 100.0) < 1e-6, s"intercept ${a.getDouble(3)}")
      val b = rows("b")
      assert(math.abs(b.getDouble(2)) < 1e-12 && math.abs(b.getDouble(3) - 7.5) < 1e-9)
      assert(rows("c").isNullAt(2) && rows("c").isNullAt(3),
        "single-event window must yield null slope, not 0/0")
      assert(rows("d").isNullAt(2) && rows("d").isNullAt(3),
        "single-DISTINCT-timestamp window must yield null slope, not tiny/tiny")
    } finally q.stop()
  }

  test("ivfIngested encodes a live vector stream identically to the batch encoder") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.IvfPq
    // 4 separated centers, deterministic jitter (the IvfPqSpec corpus shape)
    val rows = (0 until 40).map { i =>
      val c = i % 4
      StreamVec(i.toLong, t(f"2024-01-01 10:${i % 60}%02d:00"),
        Array.tabulate(8)(d => (if (d / 2 == c) 10.0f else 0.0f) +
          ((i * 7 + d * 3) % 5) * 0.01f).toSeq)
    }
    val staticDf = rows.toDF()
    val model = IvfPq.train(staticDf, "vec_id", "embedding", dim = 8, nlist = 4, m = 2, k = 4, iters = 2)
    val batch = IvfPq.encode(staticDf, "vec_id", "embedding", model).collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Int]("cluster"), r.getAs[scala.collection.Seq[Int]]("codes").toList))).toMap
    val mem = MemoryStream[StreamVec]
    mem.addData(rows.take(25): _*)
    val q = EventStream.ivfIngested(mem.toDF(), "ts", "vec_id", "embedding", model)
      .writeStream.format("memory").queryName("ivf_out").outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      mem.addData(rows.drop(25): _*) // a second micro-batch — same stateless path
      q.processAllAvailable()
      val streamed = spark.sql("SELECT id, cluster, codes, ts FROM ivf_out").collect()
        .map(r => r.getAs[Long]("id") ->
          ((r.getAs[Int]("cluster"), r.getAs[scala.collection.Seq[Int]]("codes").toList))).toMap
      assert(streamed.size === 40)
      assert(streamed === batch, "stream ingest must agree with the batch index encoder")
    } finally q.stop()
  }

  test("ivfClusterBalance counts ingested vectors per window and cluster") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.IvfPq
    val rows = (0 until 40).map { i =>
      val c = i % 4
      // clusters 0/1 in the first window, 2/3 in the second
      StreamVec(i.toLong, t(if (c < 2) "2024-01-01 10:01:00" else "2024-01-01 10:11:00"),
        Array.tabulate(8)(d => (if (d / 2 == c) 10.0f else 0.0f) +
          ((i * 7 + d * 3) % 5) * 0.01f).toSeq)
    }
    val model = IvfPq.train(rows.toDF(), "vec_id", "embedding", dim = 8, nlist = 4, m = 2, k = 4, iters = 2)
    val mem = MemoryStream[StreamVec]
    mem.addData(rows: _*)
    val q = EventStream.ivfClusterBalance(mem.toDF(), "ts", "vec_id", "embedding", model)
      .writeStream.format("memory").queryName("ivfbal_out")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val out = spark.sql("SELECT window.start, cluster, n_ingested FROM ivfbal_out").collect()
        .map(r => (r.getTimestamp(0), r.getInt(1)) -> r.getLong(2)).toMap
      assert(out.size === 4, s"expected 4 (window, cluster) rows, got $out")
      assert(out.values.toSeq.sorted === Seq(10L, 10L, 10L, 10L))
      // the two windows each carry two clusters
      assert(out.keys.map(_._1).toSet.size === 2)
    } finally q.stop()
  }

  test("orbitalScored tags live events with binary phase and bins per window") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.functions.Orbital
    val pars = Orbital.BinaryPars(pbDays = 0.5, t0Mjd = 60310.0, ecc = 0.3)
    val mem = MemoryStream[Event]
    val events = Seq(
      Event(1, t("2024-01-01 10:01:00"), 1, "click", 1.0),
      Event(2, t("2024-01-01 10:02:00"), 1, "click", 2.0),
      Event(3, t("2024-01-01 16:00:00"), 2, "view", 5.0), // different phase + window
    )
    mem.addData(events: _*)
    val q = EventStream.orbitalScored(mem.toDF(), pars, bins = 20)
      .writeStream.format("memory").queryName("orb_out").outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT phase_bin, n, sum_value FROM orb_out")
        .as[(Long, Long, Double)].collect().toSet
      // cross-check bins against the batch (scalar) phase computation
      graft.expressions.KeplerSolve.register(spark)
      val want = events.toDF()
        .withColumn("phase", Orbital.binPhase(org.apache.spark.sql.functions.col("ts"), pars))
        .groupBy((org.apache.spark.sql.functions.floor(org.apache.spark.sql.functions.col("phase") * 20)).cast("long").as("b"))
        .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.sum("value").as("s"))
        .as[(Long, Long, Double)].collect().toSet
      assert(rows == want, s"stream=$rows batch=$want")
      rows.foreach { case (b, _, _) => assert(b >= 0 && b < 20) }
    } finally q.stop()
  }

  test("enrichedByConfig joins streams on key + validity interval with bounded state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val evMem = MemoryStream[Event]
    val cfgMem = MemoryStream[(Long, Timestamp, String)]
    val cfg = cfgMem.toDF().toDF("cfg_user_id", "cfg_ts", "cfg_name")
    val q = EventStream.enrichedByConfig(evMem.toDF(), cfg, validSeconds = 3600)
      .select("event_id", "cfg_name")
      .writeStream.format("memory").queryName("cfg_enrich_out").outputMode(OutputMode.Append()).start()
    try {
      cfgMem.addData(
        (1L, t("2024-01-01 09:30:00"), "cfgA"), // covers 09:30-10:30
        (1L, t("2024-01-01 11:00:00"), "cfgB"), // covers 11:00-12:00
        (2L, t("2024-01-01 00:00:00"), "cfgC"), // expired by event time
      )
      evMem.addData(
        Event(1, t("2024-01-01 10:00:00"), 1, "click", 1.0), // inside cfgA only
        Event(2, t("2024-01-01 11:30:00"), 1, "click", 2.0), // inside cfgB only
        Event(3, t("2024-01-01 10:00:00"), 2, "view", 3.0),  // cfgC expired → no match
      )
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_id, cfg_name FROM cfg_enrich_out")
        .as[(Long, String)].collect().toSet
      assert(rows == Set((1L, "cfgA"), (2L, "cfgB")))
    } finally q.stop()
  }

  test("sessionized emits a session once its inactivity gap passes") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = EventStream.sessionized(mem.toDS(), gapSeconds = 600)
      .writeStream.format("memory").queryName("sess_out").outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        Event(1, t("2024-01-01 10:00:00"), 7, "click", 1.0),
        Event(2, t("2024-01-01 10:05:00"), 7, "click", 2.0),
      )
      q.processAllAvailable()
      // second batch arrives after the gap → first session closes
      mem.addData(Event(3, t("2024-01-01 11:00:00"), 7, "click", 4.0))
      q.processAllAvailable()
      val sessions = spark.sql("SELECT user_id, n_events, sum_value FROM sess_out")
        .as[(Long, Long, Double)].collect().toSeq
      assert(sessions == Seq((7L, 2L, 3.0)))

      // a quiet user's final session flushes once the watermark passes its
      // gap horizon (EventTimeTimeout) — no new events for user 7 needed
      mem.addData(Event(4, t("2024-01-01 14:00:00"), 99, "click", 9.0))
      q.processAllAvailable() // advances the watermark past 11:00 + gap
      mem.addData(Event(5, t("2024-01-01 14:01:00"), 99, "click", 9.0))
      q.processAllAvailable() // timeout fires in the next micro-batch
      val flushed = spark.sql("SELECT user_id, n_events, sum_value FROM sess_out")
        .as[(Long, Long, Double)].collect().toSet
      assert(flushed.contains((7L, 1L, 4.0)), s"final session not flushed: $flushed")
    } finally q.stop()
  }

  test("windowed heavy hitters keep hot keys under bounded Misra-Gries state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = EventStream.windowedHeavyHitters(mem.toDS(), _.event_type,
        windowSeconds = 3600, capacity = 2, watermark = "10 minutes")
      .writeStream.format("memory").queryName("hh_out").outputMode(OutputMode.Append()).start()
    try {
      // one window: "hot" 60×, "warm" 30×, ten singleton keys.
      // n=100, capacity 2 → undercount ≤ 100/3 ≈ 33: hot (60) MUST
      // survive with count ≥ 27; the singletons must not.
      val base = t("2024-01-01 10:00:00").getTime
      val evs = (0 until 60).map(i => Event(i, new Timestamp(base + i * 1000L), 1, "hot", 0.0)) ++
        (0 until 30).map(i => Event(100 + i, new Timestamp(base + i * 1000L), 1, "warm", 0.0)) ++
        (0 until 10).map(i => Event(200 + i, new Timestamp(base + i * 1000L), 1, s"rare$i", 0.0))
      mem.addData(evs: _*)
      q.processAllAvailable()
      // advance the watermark past the window end, then fire the timeout
      mem.addData(Event(998, t("2024-01-01 12:00:00"), 9, "later", 0.0))
      q.processAllAvailable()
      mem.addData(Event(999, t("2024-01-01 12:01:00"), 9, "later", 0.0))
      q.processAllAvailable()
      val got = spark.sql("SELECT key, min_count, group_total FROM hh_out WHERE group_total = 100")
        .as[(String, Long, Long)].collect().toSeq
      assert(got.size <= 2, s"at most `capacity` counters survive: $got")
      val hot = got.find(_._1 == "hot")
      assert(hot.nonEmpty, s"a 60%-frequency key must survive MG with capacity 2: $got")
      assert(hot.get._2 >= 27 && hot.get._2 <= 60, s"undercount bound violated: $hot")
      assert(!got.exists(_._1.startsWith("rare")), s"singletons must be evicted: $got")
    } finally q.stop()
  }

  test("sharded heavy hitters keep exact per-key locality (no split counts)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = EventStream.windowedHeavyHitters(mem.toDS(), _.event_type,
        windowSeconds = 3600, capacity = 4, watermark = "10 minutes", shards = 4)
      .writeStream.format("memory").queryName("hh_sh_out").outputMode(OutputMode.Append()).start()
    try {
      val base = t("2024-01-01 10:00:00").getTime
      val evs = (0 until 50).map(i => Event(i, new Timestamp(base + i), 1, "hot", 0.0)) ++
        (0 until 20).map(i => Event(100 + i, new Timestamp(base + i), 1, "warm", 0.0))
      mem.addData(evs: _*)
      q.processAllAvailable()
      mem.addData(Event(998, t("2024-01-01 12:00:00"), 9, "later", 0.0))
      q.processAllAvailable()
      mem.addData(Event(999, t("2024-01-01 12:01:00"), 9, "later", 0.0))
      q.processAllAvailable()
      val got = spark.sql("SELECT key, min_count FROM hh_sh_out WHERE key IN ('hot','warm')")
        .as[(String, Long)].collect().toSeq
      // each key lands in exactly ONE shard → one row, exact count (its
      // shard saw fewer than capacity distinct keys, so no decrements)
      assert(got.sorted == Seq(("hot", 50L), ("warm", 20L)).sorted, s"$got")
    } finally q.stop()
  }

  test("streaming windowedTopK keeps k rows per window and emits batch-identical ranks") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = EventStream.windowedTopK(mem.toDS(), k = 2, windowSeconds = 600,
        watermark = "10 minutes")
      .writeStream.format("memory").queryName("topk_out").outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        // window 10:00-10:10
        Event(1, t("2024-01-01 10:01:00"), 1, "view", 5.0),
        Event(2, t("2024-01-01 10:02:00"), 2, "view", 9.0),
        Event(3, t("2024-01-01 10:03:00"), 3, "view", 7.0),
        Event(4, t("2024-01-01 10:04:00"), 4, "view", 9.0), // tie: higher id loses
      )
      q.processAllAvailable()
      // a late-but-in-watermark straggler that DISPLACES into the top-2
      mem.addData(Event(5, t("2024-01-01 10:05:00"), 5, "view", 10.0))
      q.processAllAvailable()
      mem.addData(Event(9, t("2024-01-01 12:00:00"), 99, "view", 0.0)) // close windows
      q.processAllAvailable()
      val got = spark.sql("SELECT rank, event_id, value FROM topk_out WHERE user_id <> 99")
        .as[(Int, Long, Double)].collect().sortBy(_._1).toSeq
      // top-2 of {5,9,7,9,10}: the straggler 10.0 leads, then event 2
      // (9.0, id 2 beats id 4 on the tie) — the cross-batch displacement
      // path is what this pins
      assert(got === Seq((1, 5L, 10.0), (2, 2L, 9.0)))
    } finally q.stop()
  }

  test("streaming session_window emits merged sessions at the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = EventStream.sessionWindowed(mem.toDF(), gap = "30 minutes", watermark = "10 minutes")
      .selectExpr("user_id", "start", "end", "n_events", "sum_value")
      .writeStream.format("memory").queryName("sw_out").outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        // u1: two events 20 min apart -> ONE session (gap < 30m)
        Event(1, t("2024-01-01 10:00:00"), 1, "view", 1.0),
        Event(2, t("2024-01-01 10:20:00"), 1, "view", 2.0),
        // u1: 40 min later -> a SECOND session
        Event(3, t("2024-01-01 11:00:00"), 1, "view", 4.0),
      )
      q.processAllAvailable()
      mem.addData(Event(9, t("2024-01-01 13:00:00"), 99, "view", 0.0)) // advance watermark
      q.processAllAvailable()
      val got = spark.sql("SELECT user_id, start, end, n_events, sum_value FROM sw_out WHERE user_id = 1")
        .as[(Long, Timestamp, Timestamp, Long, Double)].collect()
        .sortBy(_._2.getTime)
      assert(got.length === 2, s"expected two sessions: ${got.toSeq}")
      assert(got(0)._4 === 2L && got(0)._5 === 3.0)
      assert(got(0)._3 === t("2024-01-01 10:50:00"), "session end = last event + gap")
      assert(got(1)._4 === 1L && got(1)._5 === 4.0)
    } finally q.stop()
  }

  test("streaming windowedDrift scores windows against the baseline mixture") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = EventStream.windowedDrift(mem.toDF(), Seq("view" -> 0.5, "click" -> 0.5),
        "event_type", windowDur = "10 minutes", watermark = "10 minutes")
      .selectExpr("window.start AS ws", "chi2", "n_total", "n_other")
      .writeStream.format("memory").queryName("drift_out").outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        // window 10:00-10:10: 4 views, 0 clicks, 1 other
        Event(1, t("2024-01-01 10:01:00"), 1, "view", 0.0),
        Event(2, t("2024-01-01 10:02:00"), 2, "view", 0.0),
        Event(3, t("2024-01-01 10:03:00"), 3, "view", 0.0),
        Event(4, t("2024-01-01 10:04:00"), 4, "view", 0.0),
        Event(5, t("2024-01-01 10:05:00"), 5, "error", 0.0),
        // window 10:10-10:20: balanced
        Event(6, t("2024-01-01 10:11:00"), 6, "view", 0.0),
        Event(7, t("2024-01-01 10:12:00"), 7, "click", 0.0),
      )
      q.processAllAvailable()
      mem.addData(Event(8, t("2024-01-01 12:00:00"), 99, "view", 0.0)) // advance watermark
      q.processAllAvailable()
      val got = spark.sql("SELECT ws, chi2, n_total, n_other FROM drift_out")
        .as[(Timestamp, Double, Long, Long)].collect()
        .map(r => r._1.toString.substring(11, 16) -> ((r._2, r._3, r._4))).toMap
      // window 1: inBase=4, exp 2/2 → chi2 = (4-2)^2/2 + (0-2)^2/2 = 4
      assert(got("10:00") === ((4.0, 5L, 1L)))
      assert(got("10:10") === ((0.0, 2L, 0L)))
    } finally q.stop()
  }

  test("streaming latestState emits the Upsert.latest winner per key at the idle horizon") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = EventStream.latestState(mem.toDS(), idleSeconds = 600, watermark = "10 minutes")
      .writeStream.format("memory").queryName("latest_out").outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        Event(1, t("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, t("2024-01-01 10:05:00"), 1, "click", 2.0),  // newest click for u1
        Event(3, t("2024-01-01 10:03:00"), 1, "view", 9.0),
        // same-instant updates: higher event_id wins
        Event(4, t("2024-01-01 10:02:00"), 2, "click", 7.0),
        Event(5, t("2024-01-01 10:02:00"), 2, "click", 8.0),
      )
      q.processAllAvailable()
      // a LATE event with an OLDER version: must not overwrite the winner
      mem.addData(Event(6, t("2024-01-01 10:01:00"), 1, "click", 0.5))
      q.processAllAvailable()
      // push the watermark past the idle horizons, then fire timeouts
      mem.addData(Event(7, t("2024-01-01 12:00:00"), 99, "view", 0.0))
      q.processAllAvailable()
      mem.addData(Event(8, t("2024-01-01 12:01:00"), 99, "view", 0.0))
      q.processAllAvailable()
      val got = spark.sql("SELECT user_id, event_type, event_id, value FROM latest_out")
        .as[(Long, String, Long, Double)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
      assert(got((1L, "click")) === ((2L, 2.0)), s"newest click wins, late older version ignored: $got")
      assert(got((1L, "view")) === ((3L, 9.0)))
      assert(got((2L, "click")) === ((5L, 8.0)), "same-instant tie goes to higher event_id")
    } finally q.stop()
  }

  test("streaming funnel emits batch-identical depths at the idle horizon") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    val q = EventStream.funnel(mem.toDS(), Seq("view", "click", "buy"),
        idleSeconds = 600, watermark = "10 minutes")
      .writeStream.format("memory").queryName("funnel_out").outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        // u1 completes the chain; the LATE view (second batch, within
        // watermark) must still count as the first occurrence
        Event(1, t("2024-01-01 10:05:00"), 1, "click", 0.0),
        Event(2, t("2024-01-01 10:06:00"), 1, "buy", 0.0),
        // u2: buy precedes click → depth stops after view+click? no:
        // first-click 10:02 > first-view 10:01 (depth 2), first-buy
        // 10:00 < first-click → chain breaks at buy → depth 2
        Event(3, t("2024-01-01 10:00:00"), 2, "buy", 0.0),
        Event(4, t("2024-01-01 10:01:00"), 2, "view", 0.0),
        Event(5, t("2024-01-01 10:02:00"), 2, "click", 0.0),
        // u3 never views → depth 0
        Event(6, t("2024-01-01 10:03:00"), 3, "click", 0.0),
      )
      q.processAllAvailable()
      mem.addData(Event(7, t("2024-01-01 10:04:00"), 1, "view", 0.0)) // u1's late view
      q.processAllAvailable()
      // push the watermark past every idle horizon, then fire timeouts
      mem.addData(Event(8, t("2024-01-01 12:00:00"), 99, "view", 0.0))
      q.processAllAvailable()
      mem.addData(Event(9, t("2024-01-01 12:01:00"), 99, "view", 0.0))
      q.processAllAvailable()
      val got = spark.sql("SELECT user_id, depth FROM funnel_out")
        .as[(Long, Int)].collect().toMap
      assert(got.get(1L).contains(3), s"u1 full chain via late view: $got")
      assert(got.get(2L).contains(2), s"u2 chain breaks at buy: $got")
      assert(got.get(3L).contains(0), s"u3 never viewed: $got")
    } finally q.stop()
  }

  test("qualityAudited counts per-rule failures per window, agreeing with the batch gopher bundle") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val p = graft.operators.QualityRules.Params(
      minWords = 3L, maxWords = 50L, minMeanWordLen = 1.0, maxMeanWordLen = 10.0,
      maxSymbolRatio = 0.4, minAlphaWordFraction = 0.5, minStopwords = 1L,
      stopwords = Seq("the", "a"))
    val rows = Seq(
      (1L, t("2024-01-01 10:01:00"), "the quick brown fox jumps"), // passes all
      (2L, t("2024-01-01 10:02:00"), "no stopwords here at all#"), // fails stopwords
      (3L, t("2024-01-01 10:03:00"), "a b"),                       // fails word count
      (4L, t("2024-01-01 10:04:00"), null.asInstanceOf[String]),   // fails everything
    )
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    mem.addData(rows: _*)
    val q = EventStream.qualityAudited(
        mem.toDF().toDF("doc_id", "ts", "text"), "text", "10 minutes", "30 minutes", p)
      .writeStream.format("memory").queryName("qa_out").outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val got = spark.sql(
          "SELECT n_docs, n_keep, fail_word_count, fail_stopwords FROM qa_out")
        .as[(Long, Long, Long, Long)].collect().toList
      assert(got == List((4L, 1L, 2L, 2L)), s"got $got")
      // stream/batch agreement on the keep verdict
      val batchKeep = graft.operators.QualityRules.gopher(
          rows.toDF("doc_id", "ts", "text"), "text", p)
        .filter(org.apache.spark.sql.functions.col("keep"))
        .select("doc_id").as[Long].collect().toSet
      assert(batchKeep == Set(1L))
    } finally q.stop()
  }

  test("packedOffsets assigns contiguous per-source token offsets across micro-batches, agreeing with the batch packer") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.EventStream.PackDoc
    val mem = MemoryStream[PackDoc]
    val q = EventStream.packedOffsets(mem.toDS(), seqLen = 128L)
      .writeStream.format("memory").queryName("pack_out").outputMode(OutputMode.Update()).start()
    try {
      mem.addData(PackDoc(1, "g", 100), PackDoc(2, "g", 200))
      q.processAllAvailable()
      // second batch continues g's stream from the checkpointed offset
      mem.addData(PackDoc(3, "g", 30), PackDoc(4, "g", 0), PackDoc(1, "h", 5))
      q.processAllAvailable()
      val got = spark.sql(
          "SELECT source, doc_id, start_offset, end_offset, seq_first, seq_last FROM pack_out")
        .as[(String, Long, Long, Long, Long, Long)].collect().toSet
      assert(got == Set(
        ("g", 1L, 0L, 100L, 0L, 0L),
        ("g", 2L, 100L, 300L, 0L, 2L),   // crosses two sequence boundaries
        ("g", 3L, 300L, 330L, 2L, 2L),   // batch 2 continues, zero-token doc dropped
        ("h", 1L, 0L, 5L, 0L, 0L),
      ), s"got $got")
      // stream/batch agreement: the same docs through Corpus.packSequences
      // yield the same per-doc sequence ranges
      val static = Seq(("g", 1L, 100), ("g", 2L, 200), ("g", 3L, 30), ("g", 4L, 0),
        ("h", 1L, 5)).toDF("source", "doc_id", "ntok")
      import org.apache.spark.sql.functions.{col, max, min}
      val batch = graft.operators.Corpus.packSequences(static, "source", "doc_id",
          col("ntok"), seqLen = 128L)
        .groupBy("source", "doc_id")
        .agg(min("seq_id").as("f"), max("seq_id").as("l"))
        .as[(String, Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
      assert(got.map(r => (r._1, r._2) -> ((r._5, r._6))).toMap == batch)
    } finally q.stop()
  }
}
