package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStream
import graft.streaming.EventStream.Event

class StreamingDedupSpec extends SparkSpec {

  private def t(s: String) = Timestamp.valueOf(s)

  test("stream-static join enriches a live stream with a dimension table") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, t("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(2, t("2024-01-01 10:01:00"), 2, "view", 2.0),
      Event(3, t("2024-01-01 10:02:00"), 9, "view", 3.0), // no dim row
    )
    val q = EventStream.enrichedStatic(mem.toDF(), dim, Seq("user_id"))
      .writeStream.format("memory").queryName("static_enrich_out").outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_id, tier FROM static_enrich_out")
        .as[(Long, String)].collect().toSet
      assert(rows == Set((1L, "gold"), (2L, "basic")))
    } finally q.stop()
  }

  test("deduplicatedNear drops SimHash-colliding near-dup docs within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    case class Doc(doc_id: Long, ts: Timestamp, text: String)
    val mem = MemoryStream[(Long, Timestamp, String)]
    mem.addData(
      (1L, t("2024-01-01 10:00:00"), "alpha beta gamma delta"),
      (2L, t("2024-01-01 10:00:30"), "delta gamma beta alpha"), // same word set → same simhash
      (3L, t("2024-01-01 10:01:00"), "totally different words entirely here"),
    )
    val q = EventStream.deduplicatedNear(
        mem.toDF().toDF("doc_id", "ts", "text"), "text", bits = 16, watermark = "10 minutes")
      .writeStream.format("memory").queryName("neardedup_out").outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM neardedup_out").as[Long].collect().toSet
      assert(ids.contains(3L))
      assert((ids & Set(1L, 2L)).size == 1, s"exactly one of the near-dup pair survives, got $ids")
      // the drop is observable: summed over micro-batches, 3 docs entered
      // the dedup and 2 survived — monitoring sees rows_in − rows_out = 1
      // dropped without instrumenting the sink
      def metricSum(name: String, field: String): Long =
        q.recentProgress.flatMap(p => Option(p.observedMetrics.get(name)))
          .map(_.getAs[Long](field)).sum
      assert(metricSum("neardup_in", "rows_in") == 3L)
      assert(metricSum("neardup_out", "rows_out") == 2L)
      // the engineered collision (docs 1/2: distinct texts, one
      // fingerprint) is visible as a candidate-collision count: 3
      // distinct texts − 2 distinct fingerprints = 1
      assert(metricSum("neardup_collisions", "fp_collision_hint") == 1L)
    } finally q.stop()
  }

  test("deduplicatedNearMinHash verifies signatures: drops near-dups, keeps bucket-colliding strangers") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // Texts chosen against the MinHash math (verified via batch
    // signatures below): B is A plus one word → same bucket, est J = 1;
    // D shares A's bucket (minhash[0]) but agrees on only 1/8 components;
    // C is unrelated; S is too short to fingerprint.
    val a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val b = a + " w11"
    val c = "completely different words over here nothing shared at all"
    val d = "v90 v1299 zz"
    val sigOf = graft.expressions.MinHashSig.of(
      graft.functions.TextFns.shingles(org.apache.spark.sql.functions.col("t"), 3), 8)
    val sigs = Seq(a, b, c, d).toDF("t").select(sigOf).as[Seq[String]].collect()
    assert(sigs(0).head == sigs(1).head && sigs(0) == sigs(1), "A/B must share bucket and full signature")
    assert(sigs(0).head == sigs(3).head, "D must share A's bucket")
    assert(sigs(0).iterator.zip(sigs(3).iterator).count { case (x, y) => x == y } < 4,
      "D must fail the 0.5 signature-agreement verification")

    val mem = MemoryStream[(Long, Timestamp, String)]
    mem.addData(
      (1L, t("2024-01-01 10:00:00"), a),
      (2L, t("2024-01-01 10:00:30"), b), // near-dup of A → dropped
      (3L, t("2024-01-01 10:01:00"), c), // unrelated → kept
      (4L, t("2024-01-01 10:01:30"), d), // A's bucket, verification fails → kept
      (5L, t("2024-01-01 10:02:00"), "so sh"), // < 3 words: bypass → kept
    )
    val q = EventStream.deduplicatedNearMinHash(
        mem.toDF().toDF("doc_id", "ts", "text"), "text",
        threshold = 0.5, watermark = "10 minutes", horizonMs = 10L * 60 * 1000)
      .writeStream.format("memory").queryName("mh_neardedup_out").outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM mh_neardedup_out").as[Long].collect().toSet
      assert(ids == Set(1L, 3L, 4L, 5L), s"expected near-dup 2 dropped only, got $ids")

      // past the state horizon, the same text is fresh again (state purged
      // by EventTimeTimeout — the watermark must first pass the horizon)
      mem.addData((6L, t("2024-01-01 11:00:00"), "advance watermark far beyond the horizon now"))
      q.processAllAvailable()
      mem.addData((7L, t("2024-01-01 11:00:30"), a))
      q.processAllAvailable()
      val after = spark.sql("SELECT doc_id FROM mh_neardedup_out").as[Long].collect().toSet
      assert(after.contains(7L), s"state should have expired, got $after")
    } finally q.stop()
  }

  test("deduplicated drops duplicate event ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, t("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(1, t("2024-01-01 10:00:30"), 1, "click", 1.0), // dup id
      Event(2, t("2024-01-01 10:01:00"), 1, "view", 2.0),
    )
    val q = EventStream.deduplicated(mem.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("dedup_out").outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val ids = spark.sql("SELECT event_id FROM dedup_out").as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L))
    } finally q.stop()
  }

  test("deduplicatedNearFingerprint drops Hamming-near fingerprints, keeps far ones, agrees with batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = 0x0123456789abcdefL
    // near-dup flips HIGH bits only (the low 16-bit bucket must match for
    // single-key recall — a low-chunk flip is the documented recall miss);
    // doc 4 shares the bucket but sits at distance 6 > maxDist
    val mem = MemoryStream[(Long, Timestamp, Long)]
    mem.addData(
      (1L, t("2024-01-01 10:00:00"), base),
      (2L, t("2024-01-01 10:00:30"), base ^ (1L << 40) ^ (1L << 17)), // dist 2, bucket intact
      (3L, t("2024-01-01 10:01:00"), base ^ 0x00ff00ff00ff00ffL),    // far, different bucket
      (4L, t("2024-01-01 10:01:30"), base ^ (0x3fL << 58)),          // dist 6, same bucket: SURVIVES
    )
    val q = EventStream.deduplicatedNearFingerprint(
        mem.toDF().toDF("doc_id", "ts", "fp"), "fp",
        maxDist = 3, watermark = "10 minutes")
      .writeStream.format("memory").queryName("fpdedup_out").outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM fpdedup_out").as[Long].collect().toSet
      assert(ids === Set(1L, 3L, 4L),
        s"near-dup 2 dropped; far 3 and same-bucket-but-distant 4 kept, got $ids")
    } finally q.stop()
  }
}
