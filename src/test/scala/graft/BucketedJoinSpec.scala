package graft

import org.apache.spark.sql.functions._

import graft.sources.Formats

class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("joins between co-bucketed tables plan without a shuffle exchange") {
    val left = (1L to 2000L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (1L to 2000L).map(i => (i, i * 2.0)).toDF("k", "rv")
    Formats.writeBucketedTable(left, "bkt_left", "k", 4)
    Formats.writeBucketedTable(right, "bkt_right", "k", 4)
    try {
      // disable auto-broadcast so the join would otherwise shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected no shuffle exchange in:\n$plan")
      assert(joined.count() == 2000)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }
}
