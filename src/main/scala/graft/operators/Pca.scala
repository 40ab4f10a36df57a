package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.expressions.DotProduct

/** Distributed PCA over an embedding column — whitening / dimensionality
  * reduction for the vector side of a training-data pipeline (cheaper ANN
  * on reduced vectors, embedding-drift QA, decorrelation before SQ8/PQ
  * quantization).
  *
  * Scale shape: ONE pass over the vectors with a typed `Aggregator`
  * whose buffer is d²+d+1 doubles (Σxxᵀ, Σx, n) — map-side partial
  * accumulation, partial buffers merge associatively, nothing per-row
  * ever shuffles. The d×d covariance then eigendecomposes on the DRIVER
  * (cyclic Jacobi, deterministic) — for embedding dims (64–4096) that is
  * microseconds-to-seconds of driver work, the standard tall-skinny
  * split (executors see n, the driver sees d²). `transform` projects
  * with the codegen'd DotProduct against broadcast literal components —
  * a pure map stage.
  */
object Pca {

  /** Fitted model: `mean` (d), `components` (k rows, each d — orthonormal,
    * sorted by eigenvalue desc), `explainedVariance` (k eigenvalues). */
  final case class Model(mean: Array[Double], components: Array[Array[Double]],
                         explainedVariance: Array[Double], converged: Boolean)

  /** Buffer: [n, Σx (d), Σxxᵀ upper triangle (d(d+1)/2)]. */
  private final class MomentAgg(d: Int) extends Aggregator[Seq[Double], Array[Double], Array[Double]] {
    private val tri = d * (d + 1) / 2
    override def zero: Array[Double] = new Array[Double](1 + d + tri)
    override def reduce(b: Array[Double], x: Seq[Double]): Array[Double] = {
      require(x.length == d, s"vector of dim ${x.length}, expected $d")
      b(0) += 1.0
      var i = 0
      while (i < d) { b(1 + i) += x(i); i += 1 }
      var k = 1 + d
      i = 0
      while (i < d) {
        var j = i
        while (j < d) { b(k) += x(i) * x(j); j += 1; k += 1 }
        i += 1
      }
      b
    }
    override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(r: Array[Double]): Array[Double] = r
    override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (in place on
    * a copy). Returns (eigenvalues, eigenvectors as rows), both sorted
    * by eigenvalue descending; deterministic sweep order. */
  private[graft] def jacobiEigen(sym: Array[Array[Double]], sweeps: Int = 50,
                                     relTol: Double = 1e-14): (Array[Double], Array[Array[Double]], Boolean) = {
    val d = sym.length
    val a = Array.tabulate(d, d)((i, j) => sym(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    // tolerance RELATIVE to the matrix magnitude: an absolute cutoff
    // never converges for large-entry covariances (silent wrong results)
    val frob2 = sym.map(_.map(x => x * x).sum).sum
    val tol = relTol * math.max(frob2, Double.MinPositiveValue)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < sweeps && off > tol) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          off += 2 * a(p)(q) * a(p)(q)
          if (math.abs(a(p)(q)) > tol) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * a(p)(q))
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1))
            val c = 1.0 / math.sqrt(t * t + 1)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < d) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val converged = off <= tol
    val order = (0 until d).sortBy(i => -a(i)(i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map(i => Array.tabulate(d)(r => v(r)(i))).toArray
    // deterministic sign: largest-|component| entry positive
    vecs.foreach { w =>
      var bi = 0
      var i = 1
      while (i < w.length) { if (math.abs(w(i)) > math.abs(w(bi))) bi = i; i += 1 }
      if (w(bi) < 0) { i = 0; while (i < w.length) { w(i) = -w(i); i += 1 } }
    }
    (vals, vecs, converged)
  }

  /** Fit on `df(vecCol)` (array of numeric, fixed dim `d`): one
    * aggregate pass for (n, Σx, Σxxᵀ), covariance = Σxxᵀ/n − μμᵀ
    * (population), Jacobi on the driver, keep the top `k` components. */
  def fit(df: DataFrame, vecCol: String, d: Int, k: Int): Model = {
    require(d >= 1 && k >= 1 && k <= d, s"need 1 <= k <= d, got k=$k d=$d")
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new MomentAgg(d).toColumn
    val m = df.select(col(vecCol).cast("array<double>").as("v"))
      .as[Seq[Double]].select(agg).head()
    val n = m(0)
    require(n >= 2, s"PCA needs at least 2 rows, got ${n.toLong}")
    val mean = Array.tabulate(d)(i => m(1 + i) / n)
    val cov = Array.ofDim[Double](d, d)
    var idx = 1 + d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = m(idx) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        idx += 1; j += 1
      }
      i += 1
    }
    val (vals, vecs, converged) = jacobiEigen(cov)
    Model(mean, vecs.take(k), vals.take(k), converged)
  }

  /** Project vectors onto the model's components: adds `projCol`
    * (array<double> of length k). Pure map stage — centered vector via
    * zip_with against the broadcast mean literal, one codegen'd
    * DotProduct per component. */
  def transform(df: DataFrame, vecCol: String, model: Model,
                projCol: String = "proj"): DataFrame = {
    val meanLit = lit(model.mean)
    val centered = zip_with(col(vecCol).cast("array<double>"), meanLit, (a, b) => a - b)
    val comps = model.components.map(w => DotProduct.of(centered, lit(w)))
    df.withColumn(projCol, array(comps: _*))
  }
}
