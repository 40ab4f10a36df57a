package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Top-`n` nearest centroids (squared L2, ascending) against a
  * PLAN-LITERAL codebook, as one bounded-heap pass per row →
  * array<int> of the winning cluster ids in rank order.
  *
  * This is the probe-selection stage of IVF search
  * (`row_number() OVER (PARTITION BY q_id ORDER BY cd2 ASC, cluster ASC)
  * <= nprobe`) computed statelessly: the former shape joined every query
  * row against the broadcast coarse codebook (queries × nlist
  * intermediate rows) and ran a window (an exchange keyed on q_id even
  * with the TopKPerKey rewrite); with a trained, driver-collectable
  * codebook the whole selection is a per-row k×d loop — zero exchanges,
  * zero joined rows.
  *
  * Ordering contract — identical to the window it replaces: candidates
  * order by `java.lang.Double.compare` on d² (Spark's double ordering:
  * -0.0 < 0.0, NaN last), ties at bit-equal d² to the SMALLER cluster
  * id. The d² chain is |v|² − 2·v·c + |c|² with dots accumulated in
  * array order — bit-identical to `Quantize.sqDist` over the same
  * doubles ([[DotMath]] order, the [[NearestCentroid]] contract).
  *
  * Null semantics: a null input array, a null element, or a length
  * mismatch with the codebook dimension yields NULL (the caller's
  * explode then emits no probe rows — the same final-output outcome as
  * the old path's all-null distances, whose probed clusters contributed
  * no candidate distances). Callers must fall back to the join+window
  * form when the codebook itself carries null/ragged centroids (the
  * only case where the old path's null-first ordering let a useless
  * cluster occupy a probe slot).
  */
case class NearestCentroidsTopN(child: Expression, cents: Array[Array[Double]],
                                codes: Array[Int], n: Int)
    extends UnaryExpression with CodegenFallback {

  require(cents.nonEmpty && cents.length == codes.length,
    s"codebook size ${cents.length} != codes ${codes.length} or empty")
  require(n >= 1, s"n must be >= 1, got $n")
  private val dim = cents(0).length
  require(cents.forall(c => c != null && c.length == dim), "null/ragged codebook")

  // centroid self-dots, accumulated in array order like DotMath
  private val selfDots: Array[Double] = cents.map { c =>
    var acc = 0.0; var i = 0
    while (i < dim) { acc += c(i) * c(i); i += 1 }
    acc
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroids_topn"

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

    val kOut = math.min(n, cents.length)
    // insertion-sorted top-n (n is small — the IVF nprobe contract)
    val bestD = new Array[Double](kOut)
    val bestC = new Array[Int](kOut)
    var filled = 0
    // (d1, c1) before (d2, c2)? Spark double ordering, ties to smaller id
    def before(d1: Double, c1: Int, d2: Double, c2: Int): Boolean = {
      val cd = java.lang.Double.compare(d1, d2)
      cd < 0 || (cd == 0 && c1 < c2)
    }
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var dvc = 0.0
      i = 0
      while (i < dim) { dvc += v(i) * cent(i); i += 1 }
      val d2 = vv - 2.0 * dvc + selfDots(c)
      if (filled < kOut || before(d2, codes(c), bestD(filled - 1), bestC(filled - 1))) {
        // insert in order; drop the current worst when full
        var pos = if (filled < kOut) filled else kOut - 1
        while (pos > 0 && before(d2, codes(c), bestD(pos - 1), bestC(pos - 1))) {
          bestD(pos) = bestD(pos - 1); bestC(pos) = bestC(pos - 1); pos -= 1
        }
        bestD(pos) = d2; bestC(pos) = codes(c)
        if (filled < kOut) filled += 1
      }
      c += 1
    }
    val out = new Array[Any](filled)
    i = 0
    while (i < filled) { out(i) = bestC(i); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidsTopN =
    copy(child = newChild)
}

object NearestCentroidsTopN {

  /** array<int> of the `n` nearest cluster ids by squared L2 (asc, ties
    * to the smaller id), in rank order. */
  def l2(vec: Column, cents: Array[Array[Double]], codes: Array[Int], n: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(NearestCentroidsTopN(
      org.apache.spark.sql.graft.Bridge.expression(vec), cents, codes, n))
}
