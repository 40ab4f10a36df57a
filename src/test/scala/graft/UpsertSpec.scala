package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Upsert
import graft.plans.TopKPerKeyExec

/** CDC materialization: latest-per-key snapshot (via the TopKPerKey
  * bounded-heap plan, never a window sort) and SCD-2 validity intervals
  * (half-open, deterministic under same-instant ties). */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private val changes = Seq(
    // key (u1, addr): three versions, last by ts wins
    ("u1", "addr", t("2024-01-01 10:00:00"), 1L, "v1"),
    ("u1", "addr", t("2024-01-02 10:00:00"), 2L, "v2"),
    ("u1", "addr", t("2024-01-03 10:00:00"), 3L, "v3"),
    // key (u1, phone): single version
    ("u1", "phone", t("2024-01-01 11:00:00"), 4L, "p1"),
    // key (u2, addr): same-instant updates — higher id wins
    ("u2", "addr", t("2024-01-05 09:00:00"), 5L, "old"),
    ("u2", "addr", t("2024-01-05 09:00:00"), 6L, "new"),
  ).toDF("user", "attr", "ts", "id", "value")

  test("latest keeps exactly the greatest (ts, id) row per key") {
    val out = Upsert.latest(changes, Seq("user", "attr"), Seq("ts", "id"))
      .select("user", "attr", "value").as[(String, String, String)]
      .collect().toSet
    assert(out === Set(("u1", "addr", "v3"), ("u1", "phone", "p1"), ("u2", "addr", "new")))
  }

  test("latest plans the bounded-heap TopKPerKey operator, not a window sort") {
    val df = Upsert.latest(changes, Seq("user", "attr"), Seq("ts", "id"))
    val execs = df.queryExecution.sparkPlan.collect { case e: TopKPerKeyExec => e }
    assert(execs.size === 2, "partial + final TopKPerKey phases expected")
    assert(!df.queryExecution.sparkPlan.toString.contains("Window"))
  }

  test("scd2 builds half-open intervals with one current version per key") {
    val out = Upsert.scd2(changes, Seq("user", "attr"), "ts", "id")
      .select("user", "attr", "id", "valid_from", "valid_to", "is_current")
      .as[(String, String, Long, Timestamp, Option[Timestamp], Boolean)]
      .collect().toSeq

    val u1addr = out.filter(r => r._1 == "u1" && r._2 == "addr").sortBy(_._3)
    assert(u1addr.map(_._5) === Seq(
      Some(t("2024-01-02 10:00:00")), Some(t("2024-01-03 10:00:00")), None))
    assert(u1addr.map(_._6) === Seq(false, false, true))
    // each version's valid_to is the next version's valid_from (no gaps)
    assert(u1addr.sliding(2).forall(p => p(0)._5.contains(p(1)._4)))

    // same-instant tie: the lower id gets a zero-width interval, the
    // higher id is current — deterministic, matching `latest`'s winner
    val u2 = out.filter(_._1 == "u2").sortBy(_._3)
    assert(u2.map(_._6) === Seq(false, true))
    assert(u2.head._5.contains(u2.head._4), "zero-width interval for the losing tie")

    // exactly one current row per key
    val currents = out.filter(_._6).groupBy(r => (r._1, r._2)).view.mapValues(_.size)
    assert(currents.values.forall(_ == 1))
  }

  test("applyChangeLog merges inserts/updates and drops deleted keys") {
    val snapshot = Seq(
      ("k1", t("2024-01-01 00:00:00"), 1L, "U", "one-v1"),
      ("k2", t("2024-01-01 00:00:00"), 2L, "U", "two-v1"),
      ("k4", t("2024-01-09 00:00:00"), 9L, "U", "four-newer"),
    ).toDF("key", "ts", "id", "op", "value")
    val changes = Seq(
      ("k1", t("2024-01-02 00:00:00"), 3L, "U", "one-v2"),  // update
      ("k2", t("2024-01-02 00:00:00"), 4L, "D", ""),        // delete
      ("k3", t("2024-01-02 00:00:00"), 5L, "I", "three-v1"), // insert
      ("k4", t("2024-01-02 00:00:00"), 6L, "D", ""),        // STALE delete: snapshot is newer
    ).toDF("key", "ts", "id", "op", "value")
    val out = Upsert.applyChangeLog(snapshot, changes,
        Seq("key"), Seq("ts", "id"), "op")
      .select("key", "value").as[(String, String)].collect().toMap
    assert(out === Map("k1" -> "one-v2", "k3" -> "three-v1", "k4" -> "four-newer"))

    // a winning row with a NULL op (snapshot rows that carry no
    // change-op) must survive the delete filter, not silently vanish
    val nullOp = Seq(
      ("k9", t("2024-01-05 00:00:00"), 8L, Option.empty[String], "nine-v1"),
    ).toDF("key", "ts", "id", "op", "value")
    val out3 = Upsert.applyChangeLog(nullOp, changes,
        Seq("key"), Seq("ts", "id"), "op")
      .select("key").as[String].collect().toSet
    assert(out3.contains("k9"), "null-op winner silently dropped")

    // delete-then-reinsert within the same log revives the key
    val revive = changes.union(Seq(
      ("k2", t("2024-01-03 00:00:00"), 7L, "I", "two-v2")).toDF("key", "ts", "id", "op", "value"))
    val out2 = Upsert.applyChangeLog(snapshot, revive,
        Seq("key"), Seq("ts", "id"), "op")
      .select("key", "value").as[(String, String)].collect().toMap
    assert(out2("k2") === "two-v2")
  }

  test("scd2 current rows agree with latest") {
    val viaScd = Upsert.scd2(changes, Seq("user", "attr"), "ts", "id")
      .filter(col("is_current"))
      .select("user", "attr", "id").as[(String, String, Long)].collect().toSet
    val viaLatest = Upsert.latest(changes, Seq("user", "attr"), Seq("ts", "id"))
      .select("user", "attr", "id").as[(String, String, Long)].collect().toSet
    assert(viaScd === viaLatest)
  }
}
