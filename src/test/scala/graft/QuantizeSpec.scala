package graft

import org.apache.spark.sql.functions._

import graft.operators.Quantize

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(5)
  private val dim = 16
  private val m = 4
  private val k = 4

  // two well-separated clusters per subspace so Lloyd converges fast
  private def vec(center: Float): Array[Float] =
    Array.fill(dim)(center + 0.05f * rng.nextGaussian().toFloat)

  private val data = ((1L to 12L).map(i => (i, vec(if (i % 2 == 0) 1.0f else -1.0f)))).toDF("vec_id", "embedding")

  test("trainCodebook is deterministic and yields k centroids per subspace") {
    val cb1 = Quantize.trainCodebook(data, "vec_id", "embedding", m, dim, k)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    val cb2 = Quantize.trainCodebook(data, "vec_id", "embedding", m, dim, k)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    assert(cb1 == cb2)
    assert(cb1.keySet.map(_._1) == (0 until m).toSet)
    assert(cb1.keySet.size == m * k)
    assert(cb1.values.forall(_.length == dim / m))
  }

  test("trainCodebook supports k > 256 (IvfPq coarse-quantizer reuse sizes label bits from the codebook)") {
    // 300 centers over 300 singleton vectors in 1-dim subspace: every
    // vector is its own centroid; assignment must round-trip losslessly
    // (this k would have been impossible with a fixed 8-bit label width)
    val wide = (0L until 300L).map(i => (i, Array(i.toFloat))).toDF("vec_id", "embedding")
    val cb = Quantize.trainCodebook(wide, "vec_id", "embedding", m = 1, dim = 1, k = 300, iters = 1)
    assert(cb.count() == 300)
    val codes = Quantize.encode(wide, "vec_id", "embedding", cb, m = 1, dim = 1)
    assert(codes.count() == 300)
    // distinct vectors → distinct nearest codes
    assert(codes.select("codes").distinct().count() == 300)
  }

  test("trainCodebook distributed fold == driver loop codebook-for-codebook") {
    // force the >budget path (the claimed 100 TB fallback) and pin it
    // against the default driver-resident loop: same init, same Lloyd
    // rounds, same decimal means, same empty-cluster fallback
    val local = Quantize.trainCodebook(data, "vec_id", "embedding", m, dim, k)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    spark.conf.set("spark.graft.quantize.driverCodebookMaxDoubles", "0")
    try {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val dist = Quantize.trainCodebook(data, "vec_id", "embedding", m, dim, k)
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
      assert(dist == local)
      // the distributed trainer must release its subvector cache (the
      // one persisted frame left behind is the checkpointed RESULT) — a
      // subs leak here reappears across every later timed run of a session
      val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
      assert(leaked.size <= 1,
        s"trainCodebookDistributed leaked cached RDDs beyond its result: $leaked")
    } finally spark.conf.unset("spark.graft.quantize.driverCodebookMaxDoubles")
  }

  test("encode emits m in-range codes; clusters map to distinct code words") {
    // k=2 so each natural cluster owns exactly one code per subspace
    val cb = Quantize.trainCodebook(data, "vec_id", "embedding", m, dim, k = 2)
    val codes = Quantize.encode(data, "vec_id", "embedding", cb, m, dim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.size == 12)
    assert(codes.values.forall(c => c.length == m && c.forall(x => x >= 0 && x < 2)))
    assert(codes(2L) == codes(4L))     // same cluster
    assert(codes(1L) == codes(3L))     // same cluster
    assert(codes(1L) != codes(2L))     // opposite clusters
  }

  test("encode matches encodeViaJoin code-for-code and plans zero shuffles") {
    val cb = Quantize.trainCodebook(data, "vec_id", "embedding", m, dim, k)
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    val fast = Quantize.encode(data, "vec_id", "embedding", cb, m, dim)
    val join = Quantize.encodeViaJoin(data, "vec_id", "embedding", cb, m, dim)
    assert(asMap(fast) === asMap(join))
    assert(!fast.queryExecution.executedPlan.toString.contains("Exchange"),
      "stateless encode must plan zero shuffles")
    assert(join.queryExecution.executedPlan.toString.contains("Exchange"),
      "sanity: the join form is the one that shuffles")
    // corrupt vectors get the -1 sentinel per affected subspace, never a
    // real-looking code (the join form's NaN bit-pattern packing did)
    val bads = Seq(
      (901L, Array.tabulate(dim)(d => if (d == 0) Float.NaN else 1.0f)),
      (902L, Array.tabulate(dim)(d => if (d == dim - 1) Float.PositiveInfinity else 1.0f)),
    ).toDF("vec_id", "embedding")
      .unionByName(Seq((903L, Option.empty[Array[Float]])).toDF("vec_id", "embedding"))
    val badCodes = asMap(Quantize.encode(bads, "vec_id", "embedding", cb, m, dim))
    assert(badCodes(901L).head === -1, s"NaN subspace must be -1: ${badCodes(901L)}")
    assert(badCodes(902L).last === -1, s"Inf subspace must be -1: ${badCodes(902L)}")
    assert(badCodes(903L).forall(_ === -1), s"null vec all -1: ${badCodes(903L)}")
    // the unaffected subspaces of a partially-corrupt vector still encode
    assert(badCodes(901L).tail.forall(_ >= 0))
  }

  test("adcTopK ranks by the exact asymmetric distance (re-derived scalar-side)") {
    val cb = Quantize.trainCodebook(data, "vec_id", "embedding", m, dim, k)
    val encoded = Quantize.encode(data, "vec_id", "embedding", cb, m, dim)
    val queries = data.filter(col("vec_id") === 1L)
    val out = Quantize.adcTopK(queries, encoded, cb, "vec_id", "embedding", m, dim, k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getDouble(2)))

    // scalar re-derivation of ADC distances
    val cbMap = cb.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    val codesMap = encoded.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val q = data.filter(col("vec_id") === 1L).select("embedding").as[Array[Float]].head()
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val want = codesMap.map { case (tid, codes) =>
      tid -> (0 until m).map { s =>
        val qs = q.slice(s * (dim / m), (s + 1) * (dim / m)).map(_.toDouble).toSeq
        d2(qs, cbMap((s, codes(s))))
      }.sum
    }
    out.foreach { case (tid, got) =>
      assert(math.abs(got - want(tid)) < 1e-9, s"t=$tid")
    }
    // top-ranked neighbors come from the query's own cluster
    assert(out.take(3).forall(_._1 % 2 == 1))
  }

  test("sq8Encode round-trips within scale/2 per component; constants exactly") {
    val df = Seq(
      (1L, Array(-2.0f, 0.0f, 3.5f, 7.25f)),
      (2L, Array(4.0f, 4.0f, 4.0f, 4.0f)), // constant → scale 0
    ).toDF("vec_id", "embedding")
    val enc = Quantize.sq8Encode(df, "embedding")
    val dec = enc.select(col("vec_id"), col("embedding").cast("array<double>").as("orig"),
        col("sq8_scale"),
        Quantize.sq8Decode(col("sq8_codes"), col("sq8_scale"), col("sq8_offset")).as("rt"))
      .collect()
    dec.foreach { r =>
      val orig = r.getSeq[Double](1)
      val scale = r.getDouble(2)
      val rt = r.getSeq[Double](3)
      orig.zip(rt).foreach { case (o, b) =>
        assert(math.abs(o - b) <= scale / 2 + 1e-12, s"vec ${r.getLong(0)}: $o vs $b")
      }
    }
    // codes really are bytes (1/8th the row width of the double array)
    val codeType = enc.schema("sq8_codes").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
    assert(codeType == org.apache.spark.sql.types.ByteType)
  }

  test("sq8 top-k on real embeddings recalls the exact float top-k") {
    import graft.expressions.DotProduct
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val q = emb.filter(col("vec_id") <= 2L)
      .select(col("vec_id").as("q_id"), col("embedding").cast("array<double>").as("qv"))
    def topk(targets: org.apache.spark.sql.DataFrame,
             tv: org.apache.spark.sql.Column): Map[Long, Set[Long]] = {
      val scored = q.crossJoin(targets)
        .filter(col("q_id") =!= col("t_id"))
        .withColumn("cos", DotProduct.of(col("qv"), tv) /
          (sqrt(DotProduct.of(col("qv"), col("qv"))) * sqrt(DotProduct.of(tv, tv))))
      graft.plans.TopK.perKey(scored.select("q_id", "t_id", "cos"),
          Seq("q_id"), Seq(graft.plans.TopK.desc("cos"), graft.plans.TopK.asc("t_id")), 10)
        .collect().groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    }
    val exact = topk(
      emb.select(col("vec_id").as("t_id"), col("embedding").cast("array<double>").as("tv")),
      col("tv"))
    val sq8 = topk(
      Quantize.sq8Encode(emb, "embedding")
        .select(col("vec_id").as("t_id"),
          Quantize.sq8Decode(col("sq8_codes"), col("sq8_scale"), col("sq8_offset")).as("tv")),
      col("tv"))
    // keys.toSeq: mapping over the key SET would dedupe equal per-query
    // recall values and silently skew the mean
    val recall = exact.keys.toSeq.map(k => (sq8(k) & exact(k)).size / 10.0).sum / exact.size
    assert(recall >= 0.9, s"SQ8 recall@10 = $recall")
  }
}
