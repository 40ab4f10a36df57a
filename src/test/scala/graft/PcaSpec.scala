package graft

import graft.operators.Pca

/** Distributed PCA: one-pass moment Aggregator + driver Jacobi. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("jacobiEigen diagonalizes a known symmetric matrix") {
    // [[2, 1], [1, 2]] has eigenvalues 3 (vec (1,1)/√2) and 1 (vec (1,-1)/√2)
    val (vals, vecs, converged) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(converged)
    assert(math.abs(vals(0) - 3.0) < 1e-12 && math.abs(vals(1) - 1.0) < 1e-12)
    val inv = 1.0 / math.sqrt(2)
    assert(vecs(0).zip(Array(inv, inv)).forall(p => math.abs(p._1 - p._2) < 1e-12))
    assert(math.abs(math.abs(vecs(1)(0)) - inv) < 1e-12)
    // orthonormality
    val dot = vecs(0).zip(vecs(1)).map(p => p._1 * p._2).sum
    assert(math.abs(dot) < 1e-12)
  }

  test("fit recovers the variance axis of an axis-aligned cloud") {
    // variance only along x: eigvals (2.5, 0); first component = (1, 0)
    val pts = Seq(Seq(1.0, 5.0), Seq(-1.0, 5.0), Seq(2.0, 5.0), Seq(-2.0, 5.0))
      .toDF("vec")
    val m = Pca.fit(pts, "vec", d = 2, k = 2)
    assert(m.converged)
    assert(m.mean.toSeq === Seq(0.0, 5.0))
    assert(math.abs(m.explainedVariance(0) - 2.5) < 1e-12)
    assert(math.abs(m.explainedVariance(1)) < 1e-12)
    assert(math.abs(m.components(0)(0)) > 0.999999 && math.abs(m.components(0)(1)) < 1e-6)
  }

  test("fit finds a rotated principal axis and transform projects onto it") {
    // points along direction (0.6, 0.8), amplitudes ±1, ±2
    val dirX = 0.6; val dirY = 0.8
    val amps = Seq(1.0, -1.0, 2.0, -2.0)
    val pts = amps.map(a => Seq(a * dirX, a * dirY)).toDF("vec")
    val m = Pca.fit(pts, "vec", d = 2, k = 1)
    assert(math.abs(math.abs(m.components(0)(0)) - dirX) < 1e-9)
    assert(math.abs(math.abs(m.components(0)(1)) - dirY) < 1e-9)
    // projections recover the amplitudes (up to global sign)
    val proj = Pca.transform(pts, "vec", m).select("proj")
      .as[Seq[Double]].collect().map(_.head)
    val sign = math.signum(proj(0))
    amps.zip(proj).foreach { case (a, p) => assert(math.abs(p - sign * a) < 1e-9) }
  }

  test("transform's projected variance per component equals the eigenvalue") {
    // the invariant PCA actually guarantees: Var(proj onto component i)
    // = eigenvalue i — on real embeddings, regardless of how isotropic
    // the cloud is. (The synthetic embeddings ARE near-isotropic, so a
    // dimension-cut recall claim would be false for this data — the
    // right acceleration for isotropic vectors is quantization, not PCA.)
    import org.apache.spark.sql.functions._
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val d = e.select(size(col("embedding"))).first().getInt(0)
    val k = 4
    val m = Pca.fit(e, "embedding", d, k)
    val projs = Pca.transform(e, "embedding", m, "proj")
      .select("proj").as[Seq[Double]].collect()
    val n = projs.length.toDouble
    (0 until k).foreach { i =>
      val xs = projs.map(_(i))
      val mu = xs.sum / n
      val v = xs.map(x => (x - mu) * (x - mu)).sum / n
      assert(math.abs(v - m.explainedVariance(i)) <= 1e-6 * math.max(1.0, v),
        s"component $i: projected variance $v != eigenvalue ${m.explainedVariance(i)}")
    }
  }

  test("jacobiEigen converges on large-magnitude matrices (relative tolerance)") {
    // entries ~1e6: an absolute 1e-12 cutoff would never be reached
    val (vals, _, converged) = Pca.jacobiEigen(
      Array(Array(2e6, 1e6), Array(1e6, 2e6)))
    assert(converged)
    assert(math.abs(vals(0) - 3e6) < 1e-3 && math.abs(vals(1) - 1e6) < 1e-3)
  }

  test("fit agrees on the real embeddings table and partitioning doesn't change it") {
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val d = e.select(org.apache.spark.sql.functions.size(
      org.apache.spark.sql.functions.col("embedding"))).first().getInt(0)
    val m1 = Pca.fit(e, "embedding", d, k = 4)
    val m2 = Pca.fit(e.repartition(13), "embedding", d, k = 4)
    // eigenvalues are partition-invariant up to float-sum reorder noise
    m1.explainedVariance.zip(m2.explainedVariance).foreach { case (a, b) =>
      assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(a)))
    }
    assert(m1.explainedVariance.toSeq === m1.explainedVariance.sorted(Ordering[Double].reverse).toSeq)
    // components are unit-norm
    m1.components.foreach { w =>
      assert(math.abs(w.map(x => x * x).sum - 1.0) < 1e-9)
    }
  }
}
