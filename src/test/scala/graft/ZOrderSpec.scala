package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Scalar reference: bit j of value i → position j*n + i. */
  private def mortonRef(vals: Seq[Long], bits: Int): Long = {
    val n = vals.length
    var acc = 0L
    for (i <- vals.indices; j <- 0 until bits) {
      acc |= ((vals(i) >> j) & 1L) << (j * n + i)
    }
    acc
  }

  test("mortonCode matches the scalar reference for 2 and 3 columns") {
    val rng = new scala.util.Random(11)
    val rows2 = Seq.fill(200)((rng.nextInt(1 << 16).toLong, rng.nextInt(1 << 16).toLong))
    val got2 = rows2.toDF("a", "b")
      .select(ZOrder.mortonCode(Seq(col("a"), col("b")), 16).as("z"))
      .as[Long].collect()
    assert(got2.toSeq == rows2.map { case (a, b) => mortonRef(Seq(a, b), 16) })

    val rows3 = Seq.fill(100)((rng.nextInt(1 << 10).toLong, rng.nextInt(1 << 10).toLong,
      rng.nextInt(1 << 10).toLong))
    val got3 = rows3.toDF("a", "b", "c")
      .select(ZOrder.mortonCode(Seq(col("a"), col("b"), col("c")), 10).as("z"))
      .as[Long].collect()
    assert(got3.toSeq == rows3.map { case (a, b, c) => mortonRef(Seq(a, b, c), 10) })
  }

  test("mortonCode clamps out-of-range inputs instead of corrupting the key") {
    val got = Seq((-5L, 70000L)).toDF("a", "b")
      .select(ZOrder.mortonCode(Seq(col("a"), col("b")), 16).as("z"))
      .as[Long].head()
    assert(got == mortonRef(Seq(0L, 65535L), 16))
  }

  test("z-clustered layout prunes a single-dimension box on the NON-leading dimension") {
    val rng = new scala.util.Random(7)
    val pts = Seq.fill(20000)((rng.nextInt(1000000).toDouble, rng.nextInt(1000000).toDouble))
      .toDF("x", "y")

    def matchingParts(df: org.apache.spark.sql.DataFrame): Long = {
      val env = df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(min("y").as("ylo"), max("y").as("yhi"))
      // box query on y ONLY: y in [400k, 450k) — how many files' min/max
      // envelopes does a stats-based scan have to open?
      env.filter(col("ylo") < 450000.0 && col("yhi") >= 400000.0).count()
    }

    val linear = pts.repartitionByRange(16, col("x")).sortWithinPartitions("x")
    val zed = ZOrder.cluster(pts, Seq("x", "y"), numFiles = 16)
    val linearHit = matchingParts(linear)
    val zedHit = matchingParts(zed)
    // x-sorted files each span the full y range → every file matches;
    // Morton files have tight y envelopes → most are pruned
    assert(linearHit == 16, s"x-linear layout should be unprunable on y, got $linearHit")
    assert(zedHit <= 8, s"z-order layout should prune most files on y, got $zedHit")
  }
}
