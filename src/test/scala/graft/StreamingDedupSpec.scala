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
}
