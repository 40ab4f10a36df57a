package graft

import org.apache.spark.sql.functions._

import graft.expressions.DotProduct
import graft.functions.VectorFns
import graft.operators.{Dedup, KnnJoin}
import graft.plans.TopKPerKeyExec

/** Scale behavior of the vector stack: native dot product accuracy, the
  * rank-filter→TopK rewrite firing inside the catalog queries, and LSH
  * bucketing whose candidate count stays linear as data grows. */
class VectorScaleSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(7)

  private def randVec(dim: Int): Array[Float] = Array.fill(dim)(rng.nextGaussian().toFloat)

  test("native DotProduct matches the decimal-exact fold to double precision") {
    val df = (1 to 50).map(_ => (randVec(64), randVec(64))).toDF("a", "b")
    val rows = df.select(
      DotProduct.of(col("a"), col("b")).as("fast"),
      VectorFns.dotExact(col("a"), col("b")).as("exact"),
    ).as[(Double, Double)].collect()
    rows.foreach { case (fast, exact) =>
      assert(math.abs(fast - exact) <= 1e-12 * math.max(1.0, math.abs(exact)))
    }
  }

  test("native DotProduct handles float/double array combinations") {
    val df = Seq((Array(1.0f, 2.0f), Array(3.0, 4.0))).toDF("f", "d")
    val out = df.select(
      DotProduct.of(col("f"), col("d")),
      DotProduct.of(col("d"), col("f")),
      DotProduct.of(col("d"), col("d")),
    ).as[(Double, Double, Double)].head()
    assert(out == ((11.0, 11.0, 25.0)))
  }

  test("native DotProduct null-propagates on ragged lengths and null elements (zip_with parity)") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f), Array(3.0f, 4.0f)),        // clean → 11.0
      (2L, Array(1.0f, 2.0f, 9.0f), Array(3.0f, 4.0f)),  // ragged → null
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), DotProduct.of(col("a"), col("b")).as("d"))
      .as[(Long, Option[Double])].collect().toMap
    assert(out(1L) == Some(11.0))
    assert(out(2L).isEmpty)
    // null element → null, like the zip_with composition it replaced
    val withNull = spark.sql("SELECT array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) AS a, " +
      "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)) AS b")
    assert(withNull.select(DotProduct.of(col("a"), col("b"))).collect().head.isNullAt(0))
  }

  test("q38's physical plan uses the bounded-heap TopK operator, not a full window sort") {
    val df = SparkEntry.queries("q38_cosine_topk")(spark, "/root/testdata/sf0.001")
    val execs = df.queryExecution.sparkPlan.collect { case e: TopKPerKeyExec => e }
    assert(execs.nonEmpty, "expected TopKPerKeyExec in q38's plan (rank-filter rewrite)")
  }

  test("bitsFor scales bucket count with data size and clamps to [4,24]") {
    assert(KnnJoin.bitsFor(100) == 4)
    assert(KnnJoin.bitsFor(1L << 20, perBucket = 1024) == 10)
    assert(KnnJoin.bitsFor(1_000_000_000L, perBucket = 1024) == 20)
    assert(KnnJoin.bitsFor(Long.MaxValue) == 24)
    assert(KnnJoin.bitsFor(1L << 40, perBucket = 1L << 35) == 5)
  }

  test("byEmbedding candidate pairs stay ~linear when bits scale with n") {
    def pairsAt(n: Int): Long = {
      val df = (1 to n).map(i => (i.toLong, randVec(16))).toDF("vec_id", "embedding")
      val bits = KnnJoin.bitsFor(n, perBucket = 32)
      Dedup.byEmbedding(df, "embedding", "vec_id", threshold = -2.0, bits = bits).count()
    }
    val small = pairsAt(400)  // bits=4 per bitsFor(400, 32)
    val large = pairsAt(3200) // bits=7 → 8x more buckets for 8x rows
    // Quadratic scaling would give 64x the pairs; scaled bits keep it at
    // the 8x data growth (bucket skew allows some slack).
    assert(large < small * 12, s"pair growth too fast: $small -> $large")
  }

  test("multi-table LSH recovers neighbors a single fine bucketing misses") {
    val base = randVec(16)
    val near = base.map(v => v + 0.02f * rng.nextGaussian().toFloat)
    val noise = (3L to 400L).map(i => (i, randVec(16)))
    val df = ((1L, base) +: (2L, near) +: noise).toDF("vec_id", "embedding")
    val single = Dedup.byEmbedding(df, "embedding", "vec_id", threshold = 0.95, bits = 12)
      .as[(Long, Long, Double)].collect().toSet
    val multi = Dedup.byEmbedding(df, "embedding", "vec_id", threshold = 0.95, bits = 12, tables = 6)
      .as[(Long, Long, Double)].collect().toSet
    assert(single.subsetOf(multi))
    assert(multi.exists(p => p._1 == 1L && p._2 == 2L),
      "multi-table LSH should recover the near-duplicate pair")
    // candidate pairs are deduped across tables
    assert(multi.map(p => (p._1, p._2)).size == multi.size)
  }

  test("bucketed KnnJoin with multiple tables returns one row per (q,t) pair") {
    val q = Seq((0L, randVec(16))).toDF("vec_id", "embedding")
    val t = (10L to 60L).map(i => (i, randVec(16))).toDF("vec_id", "embedding")
    val out = KnnJoin.bucketed(q, t, "embedding", "vec_id", k = 5, bits = 2, tables = 3)
      .select("q_id", "t_id").as[(Long, Long)].collect().toSeq
    assert(out.distinct.size == out.size)
    assert(out.size <= 5)
  }

  test("normalize makes cosine a plain dot; zero vectors stay zero") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFns
    val e = VectorFns.normalized(
      graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001").limit(50),
      "embedding", "u")
    // unit norm
    val norms = e.select(sqrt(VectorFns.dot(col("u"), col("u")))).as[Double].collect()
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-12))
    // cosine(a, b) == dot(normalize(a), normalize(b))
    val pairs = e.select(col("vec_id").as("ai"), col("embedding").as("ea"), col("u").as("ua"))
      .crossJoin(e.select(col("vec_id").as("bi"), col("embedding").as("eb"), col("u").as("ub")))
      .filter(col("ai") < col("bi")).limit(200)
      .select(VectorFns.cosine(col("ea"), col("eb")).as("c"),
        VectorFns.dot(col("ua"), col("ub")).as("d"))
      .as[(Double, Double)].collect()
    pairs.foreach { case (c, d) => assert(math.abs(c - d) < 1e-9) }
    val z = VectorFns.normalized(Seq((1L, Array(0.0, 0.0))).toDF("id", "v"), "v", "u")
      .select("u").as[Seq[Double]].head()
    assert(z === Seq(0.0, 0.0))
  }
}
