package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStream
import graft.streaming.EventStream.Event

/** D16 windowedDistinct (per-window HLL distinct estimate under bounded
  * state) and D17 decontaminatedBloom (stateless streaming benchmark
  * tagger). */
class StreamingDistinctSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("windowedDistinct estimates per-window distinct users, flushes once at watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    // window 10:00-10:10 - users 1,2,3 (user 1 twice); window 10:10-10:20 - users 1,4
    mem.addData(
      Event(1, t("2024-01-01 10:01:00"), 1, "click", 1.0),
      Event(2, t("2024-01-01 10:02:00"), 2, "click", 1.0),
      Event(3, t("2024-01-01 10:03:00"), 1, "view", 1.0),
      Event(4, t("2024-01-01 10:04:00"), 3, "view", 1.0),
      Event(5, t("2024-01-01 10:11:00"), 1, "click", 1.0),
      Event(6, t("2024-01-01 10:12:00"), 4, "click", 1.0),
    )
    val q = EventStream.windowedDistinct(mem.toDF(), "user_id", "10 minutes", "10 minutes")
      .writeStream.format("memory").queryName("wd_out").outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      // append mode: nothing emits until the watermark passes a window end
      assert(spark.sql("SELECT * FROM wd_out").count() === 0L)
      // push the watermark past both windows
      mem.addData(Event(7, t("2024-01-01 11:00:00"), 9, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT window.start, n_distinct_est FROM wd_out")
        .as[(Timestamp, Double)].collect().toMap
      // HLL is exact at these tiny cardinalities (sparse mode)
      assert(rows(t("2024-01-01 10:00:00")) === 3.0)
      assert(rows(t("2024-01-01 10:10:00")) === 2.0)
      assert(rows.size === 2, "each closed window flushed exactly once")
    } finally q.stop()
  }

  test("windowedDistinct sketches union across windows (mergeable rollup)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, t("2024-01-01 10:01:00"), 1, "click", 1.0),
      Event(2, t("2024-01-01 10:02:00"), 2, "click", 1.0),
      Event(3, t("2024-01-01 10:11:00"), 2, "view", 1.0),
      Event(4, t("2024-01-01 10:12:00"), 3, "view", 1.0),
    )
    val q = EventStream.windowedDistinct(mem.toDF(), "user_id", "10 minutes", "10 minutes")
      .writeStream.format("memory").queryName("wd_merge").outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      mem.addData(Event(9, t("2024-01-01 11:00:00"), 9, "click", 1.0))
      q.processAllAvailable()
      // day-level rollup WITHOUT rescanning the stream: union the
      // per-window sketches (user 2 spans both windows; union must not
      // double-count)
      val merged = spark.sql("SELECT * FROM wd_merge")
        .agg(hll_sketch_estimate(hll_union_agg(col("distinct_sketch"))).as("est"))
        .as[Double].head()
      assert(merged === 3.0, "union of window sketches = distinct users overall")
    } finally q.stop()
  }

  test("decontaminatedBloom tags benchmark-overlapping docs on a stream, passes clean ones") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val benchmark = Seq(
      "the quick brown fox jumps over the lazy dog near the river bank today",
    ).toDF("text")
    val contaminated = "intro words then the quick brown fox jumps over the lazy dog near copied"
    val clean = "completely unrelated prose about spark partitions and shuffle boundaries in engines"
    val mem = MemoryStream[(Long, Timestamp, String)]
    mem.addData(
      (1L, t("2024-01-01 10:00:00"), contaminated),
      (2L, t("2024-01-01 10:01:00"), clean),
    )
    val docs = mem.toDF().toDF("doc_id", "ts", "text")
    val q = EventStream.decontaminatedBloom(docs, benchmark, "text")
      .writeStream.format("memory").queryName("dc_out").outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, maybe_contaminated FROM dc_out")
        .as[(Long, Boolean)].collect().toMap
      assert(rows(1L), "doc sharing an 8-gram with the benchmark must be tagged")
      assert(!rows(2L), "Bloom has no false negatives; clean doc passes untagged")
    } finally q.stop()
  }

  test("decontaminatedBloom agrees with the batch prefilter contract on the same docs") {
    import spark.implicits._
    // run the SAME column logic in batch (stateless operator: identical
    // code path), against Corpus.decontaminateBloom's exact verdicts
    val benchmark = Seq(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    ).toDF("text")
    val docs = Seq(
      (1L, "prefix alpha beta gamma delta epsilon zeta eta theta suffix words"),
      (2L, "nothing in common with the benchmark text at all here friends today"),
    ).toDF("doc_id", "text")
    val streamOp = EventStream.decontaminatedBloom(docs, benchmark, "text")
      .select("doc_id", "maybe_contaminated").as[(Long, Boolean)].collect().toMap
    val batch = graft.operators.Corpus.decontaminateBloom(docs, benchmark, "text", "doc_id")
      .select("doc_id", "contaminated").as[(Long, Long)].collect().toMap
    // exact-contaminated docs are always tagged (no false negatives);
    // the clean doc is untagged here (fpp makes the reverse direction
    // probabilistic in general, deterministic for this fixture)
    assert(streamOp(1L) && batch(1L) === 1L)
    assert(!streamOp(2L) && batch(2L) === 0L)
  }

  test("empty benchmark tags nothing") {
    import spark.implicits._
    val benchmark = Seq.empty[String].toDF("text")
    val docs = Seq((1L, "any text at all in this document right here now")).toDF("doc_id", "text")
    val got = EventStream.decontaminatedBloom(docs, benchmark, "text")
      .select("maybe_contaminated").as[Boolean].collect()
    assert(got === Array(false))
  }
}
