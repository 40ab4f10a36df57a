package graft

import org.apache.spark.sql.DataFrame

import graft.queries.Queries

/** The engine's determinism guarantee: results are bit-identical under any
  * partitioning (the decimal-aggregate policy, Num.scala). Verified by
  * running oracle-backed queries under 2 vs 17 shuffle partitions. */
class DeterminismSpec extends SparkSpec {

  private def rowsOf(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("aggregate queries are bitwise partition-count invariant") {
    val names = Seq("q01_profile_stats", "q16_cumulative_snr", "q20_sigma_clip",
      "q38_cosine_topk", "q44_ivf_assign")
    val dir = "/root/testdata/sf0.001"
    names.foreach { name =>
      val fn = Queries.queryMap(name)
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
}
