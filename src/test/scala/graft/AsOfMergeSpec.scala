package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin
import graft.plans.{AsOfJoinMergeExec, AsOfMerge}

/** The sorted-merge as-of exec must agree exactly with the union+window
  * formulation — including equal-time inclusion, tiebreaks on duplicate
  * right times, and unmatched-left nulls — while planning as the custom
  * operator (each side shuffled at its own width, single merge pass). */
class AsOfMergeSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("plan uses AsOfJoinMergeExec with both sides sorted") {
    val left = Seq((1L, t("2024-01-01 10:00:00"))).toDF("k", "ts")
    val right = Seq((1L, t("2024-01-01 09:00:00"), "a", 1L)).toDF("rk", "rts", "cfg", "rid")
    val df = AsOfMerge.join(left, right, "k", "rk", "ts", "rts", Seq("cfg"), Some("rid"))
    val execs = df.queryExecution.sparkPlan.collect { case e: AsOfJoinMergeExec => e }
    assert(execs.nonEmpty)
    assert(df.queryExecution.executedPlan.toString.contains("Sort"))
  }

  test("merge semantics: most recent <=, equal-time match, tiebreak, unmatched nulls") {
    val left = Seq(
      (1L, t("2024-01-01 10:00:00")),
      (1L, t("2024-01-01 12:00:00")),
      (2L, t("2024-01-01 09:00:00")), // equal-time right row matches
      (3L, t("2024-01-01 08:00:00")), // no right rows at all for key 3
      (4L, t("2024-01-01 08:00:00")), // right rows exist but all later
    ).toDF("k", "ts")
    val right = Seq(
      (1L, t("2024-01-01 09:30:00"), "cfgA", 1L),
      (1L, t("2024-01-01 11:00:00"), "cfgB", 2L),
      (1L, t("2024-01-01 11:00:00"), "cfgB2", 3L), // duplicate time: max rid wins
      (1L, t("2024-01-01 13:00:00"), "cfgC", 4L),
      (2L, t("2024-01-01 09:00:00"), "cfgD", 5L),
      (4L, t("2024-01-01 23:00:00"), "cfgE", 6L),
    ).toDF("rk", "rts", "cfg", "rid")

    val out = AsOfMerge.join(left, right, "k", "rk", "ts", "rts", Seq("cfg"), Some("rid"))
      .select("k", "ts", "cfg").as[(Long, Timestamp, Option[String])].collect().toSet
    assert(out == Set(
      (1L, t("2024-01-01 10:00:00"), Some("cfgA")),
      (1L, t("2024-01-01 12:00:00"), Some("cfgB2")),
      (2L, t("2024-01-01 09:00:00"), Some("cfgD")),
      (3L, t("2024-01-01 08:00:00"), None),
      (4L, t("2024-01-01 08:00:00"), None),
    ))
  }

  test("forward merge: earliest >=, equal-time match, max tiebreak, peek keeps the row for later lefts") {
    val left = Seq(
      (1L, t("2024-01-01 10:00:00")), // → cfgB2 (11:00, max rid of the equal-time run)
      (1L, t("2024-01-01 10:30:00")), // → cfgB2 again (peek must not consume)
      (1L, t("2024-01-01 11:00:00")), // equal-time right matches (>= inclusive)
      (1L, t("2024-01-01 14:00:00")), // nothing at/after → null
      (2L, t("2024-01-01 09:00:00")), // equal time exactly
    ).toDF("k", "ts")
    val right = Seq(
      (1L, t("2024-01-01 09:30:00"), "cfgA", 1L),
      (1L, t("2024-01-01 11:00:00"), "cfgB", 2L),
      (1L, t("2024-01-01 11:00:00"), "cfgB2", 3L), // duplicate time: max rid wins
      (1L, t("2024-01-01 13:00:00"), "cfgC", 4L),
      (2L, t("2024-01-01 09:00:00"), "cfgD", 5L),
    ).toDF("rk", "rts", "cfg", "rid")
    val out = AsOfMerge.join(left, right, "k", "rk", "ts", "rts", Seq("cfg"), Some("rid"),
        direction = "forward")
      .select("k", "ts", "cfg").as[(Long, Timestamp, Option[String])].collect().toSet
    assert(out == Set(
      (1L, t("2024-01-01 10:00:00"), Some("cfgB2")),
      (1L, t("2024-01-01 10:30:00"), Some("cfgB2")),
      (1L, t("2024-01-01 11:00:00"), Some("cfgB2")),
      (1L, t("2024-01-01 14:00:00"), None),
      (2L, t("2024-01-01 09:00:00"), Some("cfgD")),
    ))
  }

  test("null-time left rows match nothing in either merge direction") {
    // forward without the explicit guard would let a null time (compares
    // below everything) satisfy the >= bound for the whole key run and
    // match the earliest right row
    val left = Seq((1L, Option.empty[Timestamp]), (1L, Some(t("2024-01-01 10:00:00"))))
      .toDF("k", "ts")
    val right = Seq((1L, t("2024-01-01 09:00:00"), "cfgA", 1L)).toDF("rk", "rts", "cfg", "rid")
    Seq("backward", "forward").foreach { dir =>
      val out = AsOfMerge.join(left, right, "k", "rk", "ts", "rts", Seq("cfg"), Some("rid"),
          direction = dir)
        .select("ts", "cfg").as[(Option[Timestamp], Option[String])].collect().toMap
      assert(out(None).isEmpty, s"direction=$dir matched a null-time left row")
      val expected = if (dir == "backward") Some("cfgA") else None
      assert(out(Some(t("2024-01-01 10:00:00"))) == expected)
    }
  }

  test("forward merge agrees with the union+window forward formulation on randomized data") {
    val rng = new scala.util.Random(13)
    val base = t("2024-01-01 00:00:00").getTime
    val left = (1 to 400).map { i =>
      (rng.nextInt(8).toLong, new Timestamp(base + rng.nextInt(100000) * 1000L), i.toLong)
    }.toDF("k", "ts", "lid")
    val right = (1 to 300).map { i =>
      val cfg = if (rng.nextInt(4) == 0) None else Some(s"c$i")
      (rng.nextInt(10).toLong, new Timestamp(base + rng.nextInt(100000) * 1000L), cfg, i.toLong)
    }.toDF("rk", "rts", "cfg", "rid")
    val merge = AsOfMerge.join(left, right, "k", "rk", "ts", "rts", Seq("cfg"), Some("rid"),
        direction = "forward")
      .select("lid", "asof_time", "cfg")
      .as[(Long, Option[Timestamp], Option[String])].collect().toSet
    val window = AsOfJoin.join(left, right, "k", "rk", "ts", "rts", Seq("cfg"), Some("rid"),
        direction = "forward")
      .select(col("lid"), col("asof_time"), col("cfg"))
      .as[(Long, Option[Timestamp], Option[String])].collect().toSet
    assert(merge == window)
  }

  test("agrees with the union+window formulation on randomized data (incl. null carries)") {
    val rng = new scala.util.Random(11)
    val base = t("2024-01-01 00:00:00").getTime
    val left = (1 to 400).map { i =>
      (rng.nextInt(8).toLong, new Timestamp(base + rng.nextInt(100000) * 1000L), i.toLong)
    }.toDF("k", "ts", "lid")
    // ~1/4 of carried values are null: the most recent right ROW must win
    // atomically — a per-column fill would stitch values across rows
    val right = (1 to 300).map { i =>
      val cfg = if (rng.nextInt(4) == 0) None else Some(s"c$i")
      (rng.nextInt(10).toLong, new Timestamp(base + rng.nextInt(100000) * 1000L), cfg, i.toLong)
    }.toDF("rk", "rts", "cfg", "rid")

    val merge = AsOfMerge.join(left, right, "k", "rk", "ts", "rts", Seq("cfg"), Some("rid"))
      .select("lid", "asof_time", "cfg")
      .as[(Long, Option[Timestamp], Option[String])].collect().toSet
    val window = AsOfJoin.join(left, right, "k", "rk", "ts", "rts", Seq("cfg"), Some("rid"))
      .select(col("lid"), col("asof_time"), col("cfg"))
      .as[(Long, Option[Timestamp], Option[String])].collect().toSet
    assert(merge == window)
  }
}
