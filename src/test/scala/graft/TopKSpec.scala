package graft

import org.apache.spark.sql.functions._

import graft.plans.{TopK, TopKPerKeyExec}

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def sample = (1 to 500).map { i =>
    (s"g${i % 7}", i.toLong, (i * 37 % 101).toDouble)
  }.toDF("g", "id", "score")

  test("TopK.perKey matches the window row_number formulation") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val viaWindow = sample.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).drop("rn")
      .as[(String, Long, Double)].collect().toSet
    val viaTopK = TopK.perKey(sample, Seq("g"), Seq(TopK.desc("score"), TopK.asc("id")), 5)
      .as[(String, Long, Double)].collect().toSet
    assert(viaTopK == viaWindow)
  }

  test("TopK.perKey plans partial + final exec nodes around one exchange") {
    val df = TopK.perKey(sample, Seq("g"), Seq(TopK.desc("score"), TopK.asc("id")), 3)
    // sparkPlan = pre-AQE physical plan (AQE wraps executedPlan lazily)
    val execs = df.queryExecution.sparkPlan.collect { case e: TopKPerKeyExec => e }
    assert(execs.length == 2)
    assert(execs.map(_.partial).toSet == Set(true, false))
  }

  test("TopK.perKey handles k larger than group size") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("g", "id")
    val out = TopK.perKey(df, Seq("g"), Seq(TopK.asc("id")), 10)
    assert(out.count() == 3)
  }
}
