package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid selection against a PLAN-LITERAL codebook in one
  * tight primitive loop per row → struct(metric, cluster).
  *
  * Why an expression and not a composition: the join form (crossJoin
  * broadcast centroids + argmax aggregate) materializes n×k wide rows —
  * with the scale-honest k ∝ n blocking that join is quadratic in rows
  * churned, not just flops (measured: q89's sf1 assignment = 100M joined
  * 64-dim rows). The HOF form (`transform` + `array_max` over a literal
  * array) keeps row count flat but evaluates k interpreted lambda bodies
  * per row — slower than the join at k in the thousands. This expression
  * is the per-row loop both of those approximate: k×d multiply-adds over
  * primitive arrays, no allocation until the single result struct.
  *
  * Determinism contract: dot products accumulate in array order (the
  * [[DotMath]] order), centroid norms are sqrt of the same sequential
  * self-dot, so metrics are bit-identical to the `VectorFns.dot`-built
  * column expressions they replace. Ties: cosine argmax breaks to the
  * LARGER cluster id at full double precision — exactly the q89 oracle's
  * `ORDER BY cosine DESC, assigned DESC`; L2 argmin breaks to the
  * SMALLER id — `array_min` on struct(d2, code) semantics.
  *
  * Null semantics: a null input array, a null element, or a length
  * mismatch with the codebook dimension yields a null struct (the same
  * rows the DotProduct compositions nulled). Codebook arrays are plan
  * literals — driver-held k by contract (KMeans Model / collected
  * coarse codebooks), not for codebooks that only exist distributed.
  *
  * CodegenFallback: one virtual call per row into the k×d loop; the
  * loop itself is JIT-compiled Scala, so codegen would only save the
  * call overhead, not the work.
  */
case class NearestCentroid(child: Expression, cents: Array[Array[Double]],
                           codes: Array[Int], useCosine: Boolean)
    extends UnaryExpression with CodegenFallback {

  require(cents.nonEmpty && cents.length == codes.length,
    s"codebook size ${cents.length} != codes ${codes.length} or empty")
  private val dim = cents(0).length
  require(cents.forall(_.length == dim), "ragged codebook")

  // centroid self-dots, accumulated in array order like DotMath
  private val selfDots: Array[Double] = cents.map { c =>
    var acc = 0.0; var i = 0
    while (i < dim) { acc += c(i) * c(i); i += 1 }
    acc
  }
  private val norms: Array[Double] = selfDots.map(math.sqrt)

  override def dataType: DataType = StructType(Seq(
    StructField("metric", DoubleType, nullable = false),
    StructField("cluster", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = if (useCosine) "nearest_centroid_cos" else "nearest_centroid_l2"

  // lazy: child.dataType is only legal after analysis resolves it
  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != dim) return null
    // copy once to a primitive array (also the null-element check);
    // every centroid pass then reads primitive doubles
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (a.isNullAt(i)) return null
      v(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    var vv = 0.0
    i = 0
    while (i < dim) { vv += v(i) * v(i); i += 1 }
    val nrmV = math.sqrt(vv)

    var bestMetric = 0.0
    var bestCode = 0
    var first = true
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var dvc = 0.0
      i = 0
      while (i < dim) { dvc += v(i) * cent(i); i += 1 }
      if (useCosine) {
        val ccos = dvc / (nrmV * norms(c))
        // argmax; ties (exact equality) to the LARGER cluster id
        if (first || ccos > bestMetric ||
            (ccos == bestMetric && codes(c) > bestCode)) {
          bestMetric = ccos; bestCode = codes(c); first = false
        }
      } else {
        val d2 = vv - 2.0 * dvc + selfDots(c)
        // argmin; ties to the SMALLER cluster id
        if (first || d2 < bestMetric ||
            (d2 == bestMetric && codes(c) < bestCode)) {
          bestMetric = d2; bestCode = codes(c); first = false
        }
      }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestMetric, bestCode))
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {

  /** struct(metric = cosine, cluster): argmax cosine, ties to larger id. */
  def cosine(vec: Column, cents: Array[Array[Double]], codes: Array[Int]): Column =
    org.apache.spark.sql.graft.Bridge.column(NearestCentroid(
      org.apache.spark.sql.graft.Bridge.expression(vec), cents, codes, useCosine = true))

  /** struct(metric = squared L2, cluster): argmin d², ties to smaller id. */
  def l2(vec: Column, cents: Array[Array[Double]], codes: Array[Int]): Column =
    org.apache.spark.sql.graft.Bridge.column(NearestCentroid(
      org.apache.spark.sql.graft.Bridge.expression(vec), cents, codes, useCosine = false))
}
