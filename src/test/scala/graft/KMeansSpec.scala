package graft

import graft.operators.KMeans

/** Distributed Lloyd k-means: recovers separated clusters, converges
  * early, reports exact means/sizes/inertia, deterministic across runs. */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated blobs in 2-D (exact means: (1.0, 1.1) and (9.0, 9.1))
  private val points = Seq(
    (1L, Array(0.8, 1.0)), (2L, Array(1.2, 1.2)), (3L, Array(1.0, 1.1)),
    (4L, Array(8.8, 9.0)), (5L, Array(9.2, 9.2)), (6L, Array(9.0, 9.1)),
  ).toDF("id", "vec")

  test("fit recovers separated blobs and converges before maxIters") {
    val m = KMeans.fit(points, "id", "vec", k = 2, maxIters = 10, tol = 1e-9)
    assert(m.converged, "separated blobs must converge")
    assert(m.iterations < 10)
    val cents = m.centroids.select("cluster", "centroid", "size")
      .as[(Int, Array[Double], Long)].collect().sortBy(_._2.head)
    assert(cents.map(_._3).toSeq === Seq(3L, 3L))
    // exact decimal means then one double division: equal to the true
    // means within an ulp (3.3/3 lands at 1.0999999999999999)
    cents(0)._2.zip(Seq(1.0, 1.1)).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12) }
    cents(1)._2.zip(Seq(9.0, 9.1)).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12) }
    // inertia = sum of squared distances to the (near-exact) means
    val expected = Seq((0.8, 1.0), (1.2, 1.2), (1.0, 1.1)).map { case (x, y) =>
      math.pow(x - 1.0, 2) + math.pow(y - 1.1, 2)
    }.sum * 2 // blobs are symmetric translates
    assert(math.abs(m.inertia - expected) < 1e-9)
  }

  test("assign maps new vectors to the nearest centroid") {
    val m = KMeans.fit(points, "id", "vec", k = 2, maxIters = 10)
    val fresh = Seq((100L, Array(0.0, 0.0)), (101L, Array(10.0, 10.0)))
      .toDF("id", "vec")
    val got = KMeans.assign(fresh, "id", "vec", m.centroids)
      .select("id", "cluster").as[(Long, Int)].collect().toMap
    assert(got(100L) !== got(101L), "opposite corners land in different clusters")
    // 100 joins the low blob, 101 the high blob
    val lowCluster = KMeans.assign(points.filter($"id" === 1L), "id", "vec", m.centroids)
      .select("cluster").as[Int].head()
    assert(got(100L) === lowCluster)
  }

  test("fit is deterministic across repeated runs") {
    def run() = KMeans.fit(points, "id", "vec", k = 2, maxIters = 10)
      .centroids.select("cluster", "centroid").as[(Int, Array[Double])]
      .collect().map { case (c, v) => (c, v.toSeq) }.sortBy(_._1).toSeq
    assert(run() === run())
  }

  test("k-means|| init spreads seeds across blobs (first-k-ids would start all in one)") {
    // three well-separated blobs; the three SMALLEST ids all sit in blob A,
    // so the replaced first-k-ids init would have seeded every center in
    // one blob — k-means|| must still recover one cluster per blob with
    // the optimal inertia
    val blobs = Seq(
      (1L, Array(0.0, 0.2)), (2L, Array(0.2, 0.0)), (3L, Array(0.1, 0.1)),
      (4L, Array(100.0, 0.1)), (5L, Array(100.2, 0.3)),
      (6L, Array(0.1, 100.0)), (7L, Array(0.3, 100.2)),
    ).toDF("id", "vec")
    val m = KMeans.fit(blobs, "id", "vec", k = 3, maxIters = 15, tol = 1e-9)
    val sizes = m.centroids.select("size").as[Long].collect().sorted.toSeq
    assert(sizes === Seq(2L, 2L, 3L), s"one cluster per blob, got $sizes")
    // optimal inertia: exact within-blob SSE of the three blobs
    def sse(pts: Seq[(Double, Double)]): Double = {
      val mx = pts.map(_._1).sum / pts.size
      val my = pts.map(_._2).sum / pts.size
      pts.map { case (x, y) => math.pow(x - mx, 2) + math.pow(y - my, 2) }.sum
    }
    val optimal = sse(Seq((0.0, 0.2), (0.2, 0.0), (0.1, 0.1))) +
      sse(Seq((100.0, 0.1), (100.2, 0.3))) + sse(Seq((0.1, 100.0), (0.3, 100.2)))
    assert(m.inertia <= optimal + 1e-9, s"inertia ${m.inertia} worse than optimal $optimal")
  }

  test("seedRound1: seed row + draw-selected rows; saturated input selects nothing") {
    val blobs = Seq(
      (1L, Array(0.0, 0.2)), (2L, Array(0.2, 0.0)), (3L, Array(0.1, 0.1)),
      (4L, Array(100.0, 0.1)), (5L, Array(100.2, 0.3)),
    ).toDF("id", "vec")
    val out = KMeans.seedRound1(blobs, "id", "vec", k = 2)
      .select("id", "round", "u", "d2").collect()
    val seeds = out.filter(_.getInt(1) == 0)
    assert(seeds.length === 1 && seeds(0).isNullAt(2) && seeds(0).isNullAt(3))
    // selected rows carry the draw and the distance, and obey the rule
    val selected = out.filter(_.getInt(1) == 1)
    selected.foreach { r =>
      assert(!r.isNullAt(2) && !r.isNullAt(3))
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) < 1.0)
    }
    // the seed has d2 = 0 → threshold 0 → can never select itself
    assert(!selected.map(_.getLong(0)).contains(seeds(0).getLong(0)))
    // saturated: every point ON the single candidate → only the seed row
    val sat = Seq((1L, Array(1.0, 1.0)), (2L, Array(1.0, 1.0))).toDF("id", "vec")
    val so = KMeans.seedRound1(sat, "id", "vec", k = 2).collect()
    assert(so.length === 1 && so(0).getInt(1) === 0)
    // null vectors don't NPE the production seeding (they carry no
    // seeding information; FirstIds/seedRound1 filter them — the
    // k-means|| path must match, found in review)
    val withNull = Seq((1L, Some(Array(0.0, 0.0))), (2L, Some(Array(9.0, 9.0))),
      (3L, Option.empty[Array[Double]])).toDF("id", "vec")
    val m = KMeans.fit(withNull.filter($"vec".isNotNull), "id", "vec", k = 2, maxIters = 3)
    assert(m.centroids.count() === 2)
    val m2 = KMeans.fit(withNull, "id", "vec", k = 2, maxIters = 3)
    assert(m2.centroids.count() === 2)
  }

  test("chosenSeeds returns ranked distinct seed ids that spread across blobs") {
    val blobs = Seq(
      (1L, Array(0.0, 0.2)), (2L, Array(0.2, 0.0)), (3L, Array(0.1, 0.1)),
      (4L, Array(100.0, 0.1)), (5L, Array(100.2, 0.3)),
      (6L, Array(0.1, 100.0)), (7L, Array(0.3, 100.2)),
    ).toDF("id", "vec")
    val seeds = KMeans.chosenSeeds(blobs, "id", "vec", k = 3, rounds = 3)
      .orderBy("rank").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(seeds.map(_._1).toSeq === (1 to seeds.length))
    assert(seeds.map(_._2).distinct.length === seeds.length)
    // with 3 well-separated blobs the greedy reduction lands one seed in
    // each (weight pulls the first, farthest-point the others)
    def blob(id: Long): Int = if (id <= 3) 0 else if (id <= 5) 1 else 2
    assert(seeds.length === 3 && seeds.map(s => blob(s._2)).distinct.length === 3,
      s"seeds must spread across blobs, got $seeds")
    // saturated input (all duplicate vectors): one seed, never k
    val sat = Seq((1L, Array(1.0)), (2L, Array(1.0)), (3L, Array(1.0))).toDF("id", "vec")
    assert(KMeans.chosenSeeds(sat, "id", "vec", k = 3).count() === 1)
  }

  test("k larger than distinct points keeps empty clusters at their init") {
    val tiny = Seq((1L, Array(1.0)), (2L, Array(2.0))).toDF("id", "vec")
    val m = KMeans.fit(tiny, "id", "vec", k = 3, maxIters = 5)
    // only 2 init centroids exist (init takes first k rows, capped by data)
    val n = m.centroids.count()
    assert(n === 2)
    assert(m.centroids.agg(org.apache.spark.sql.functions.sum("size"))
      .as[Long].head() === 2L)
  }
}
