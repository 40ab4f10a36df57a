package graft

import graft.operators.IvfPq

class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  // 4 well-separated cluster centers in 8-dim; 10 vectors per cluster with
  // deterministic small jitter (no RNG — reproducible across runs)
  private def corpus = (0 until 40).map { i =>
    val c = i % 4
    val base = Array.tabulate(8)(d => if (d / 2 == c) 10.0f else 0.0f)
    val jit = Array.tabulate(8)(d => ((i * 7 + d * 3) % 5) * 0.01f)
    (i.toLong, base.zip(jit).map { case (a, b) => a + b })
  }.toDF("vec_id", "embedding")

  test("train/encode: every vector gets a cluster and m codes") {
    val model = IvfPq.train(corpus, "vec_id", "embedding", dim = 8, nlist = 4, m = 2, k = 4, iters = 2)
    assert(model.coarse.count() == 4)
    assert(model.pq.count() == 2 * 4) // m subspaces × k codes
    val enc = IvfPq.encode(corpus, "vec_id", "embedding", model).collect()
    assert(enc.length == 40)
    enc.foreach { r =>
      assert(r.getAs[Int]("cluster") >= 0 && r.getAs[Int]("cluster") < 4)
      assert(r.getAs[scala.collection.Seq[Int]]("codes").length == 2)
    }
    // the coarse quantizer separates the four true clusters: vectors of
    // the same true cluster land together
    val byTrue = enc.map(r => (r.getAs[Long]("id") % 4) -> r.getAs[Int]("cluster"))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(byTrue.values.forall(_.size == 1), s"coarse clusters split a true cluster: $byTrue")
  }

  test("search: probing the home cluster finds the vector itself at rank 1") {
    val model = IvfPq.train(corpus, "vec_id", "embedding", dim = 8, nlist = 4, m = 2, k = 4, iters = 2)
    val encoded = IvfPq.encode(corpus, "vec_id", "embedding", model)
    val queries = corpus.filter($"vec_id".isin(0L, 1L, 2L, 3L, 17L))
    val out = IvfPq.search(queries, encoded, model, "vec_id", "embedding", nprobe = 2, k = 3)
      .collect()
    val byQ = out.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 17L))
    byQ.foreach { case (q, rows) =>
      assert(rows.length == 3, s"query $q returned ${rows.length} rows")
      val top = rows.minBy(_.getAs[Int]("rank"))
      assert(top.getAs[Long]("t_id") == q,
        s"query $q top-1 was ${top.getAs[Long]("t_id")} (ADC must rank the vector itself first)")
      // every candidate comes from a probed (= nearby) cluster: its true
      // cluster matches the query's
      rows.foreach(r => assert(r.getAs[Long]("t_id") % 4 == q % 4))
    }
  }

  test("residual PQ reconstructs tighter than raw PQ at the same bit budget") {
    // ADC self-distance is the PQ reconstruction error of the (residual)
    // vector; compare against raw-vector PQ (Quantize.adcTopK) self-match.
    val model = IvfPq.train(corpus, "vec_id", "embedding", dim = 8, nlist = 4, m = 2, k = 4, iters = 2)
    val encoded = IvfPq.encode(corpus, "vec_id", "embedding", model)
    val selfIvf = IvfPq.search(corpus, encoded, model, "vec_id", "embedding", nprobe = 1, k = 1)
      .filter($"q_id" === $"t_id").agg(org.apache.spark.sql.functions.sum("adc_d2"))
      .as[Double].head()

    val rawCb = graft.operators.Quantize.trainCodebook(corpus, "vec_id", "embedding", m = 2, dim = 8, k = 4, iters = 2)
    val rawEnc = graft.operators.Quantize.encode(corpus, "vec_id", "embedding", rawCb, m = 2, dim = 8)
    val selfRaw = graft.operators.Quantize.adcTopK(corpus, rawEnc, rawCb, "vec_id", "embedding", m = 2, dim = 8, k = 1)
      .filter($"q_id" === $"t_id").agg(org.apache.spark.sql.functions.sum("adc_d2"))
      .as[Double].head()

    // raw PQ must spread 4 codewords per subspace over 4 far-apart
    // clusters; residual PQ only covers the small jitter ball
    assert(selfIvf < selfRaw,
      s"residual ADC self-error $selfIvf should beat raw-PQ $selfRaw")
  }
}
