package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Newton-iteration core for Kepler's equation, shared by interpreted and
  * codegen paths. Fixed iteration count keeps results bit-deterministic
  * regardless of convergence order.
  */
object KeplerMath {
  /** Solve E - ecc*sin(E) = M for eccentric anomaly E.
    * Mirrors `binary_tools.get_eccentric_anomaly` (binary_tools.py:232):
    * near-circular orbits short-circuit to E = M. */
  def solve(m: Double, ecc: Double): Double = {
    if (ecc < 1e-4) return m
    var e = m
    var i = 0
    while (i < 30) {
      e = e - (e - ecc * math.sin(e) - m) / (1.0 - ecc * math.cos(e))
      i += 1
    }
    e
  }

  /** True anomaly from eccentric anomaly, rescaled to count whole orbits
    * (`get_true_anomaly`, binary_tools.py:252). */
  def trueAnomaly(e: Double, ecc: Double): Double = {
    var u = 2.0 * math.atan2(
      math.sqrt(1.0 + ecc) * math.sin(e / 2.0),
      math.sqrt(1.0 - ecc) * math.cos(e / 2.0))
    if (u < 0) u += 2.0 * math.Pi
    u + math.floor(e / (2.0 * math.Pi)) * 2.0 * math.Pi
  }

  /** Binary phase in [0,1) from mean anomaly + ELL1/BT parameters
    * (`get_binphase`, binary_tools.py:76). */
  def binPhase(m: Double, ecc: Double, om0: Double, omdotRadPerDay: Double, ombRadPerDay: Double): Double = {
    val e = solve(m, ecc)
    val u = trueAnomaly(e, ecc)
    val om = om0 + omdotRadPerDay * u / ombRadPerDay
    val uNorm = u % (2.0 * math.Pi)
    (((uNorm + om + 2.0 * math.Pi) % (2.0 * math.Pi)) / (2.0 * math.Pi) + 1.0) % 1.0
  }
}

/** Native Catalyst expression solving Kepler's equation per row with
  * whole-stage codegen (no UDF serialization, no boxing in the hot path).
  *
  * `kepler_solve(meanAnomaly, eccentricity)` → eccentric anomaly (radians).
  */
case class KeplerSolve(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "kepler_solve"

  override protected def nullSafeEval(m: Any, ecc: Any): Any =
    KeplerMath.solve(m.asInstanceOf[Double], ecc.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (m, e) => s"graft.expressions.KeplerMath$$.MODULE$$.solve($m, $e)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): KeplerSolve =
    copy(left = newLeft, right = newRight)
}

object KeplerSolve {
  /** Build with inputs coerced to double (the expression itself assumes
    * double children). */
  def coerced(m: Expression, ecc: Expression): KeplerSolve =
    KeplerSolve(Cast(m, DoubleType), Cast(ecc, DoubleType))

  /** Register `kepler_solve` as a SQL function on an existing session (no
    * extensions required): `expr("kepler_solve(m, ecc)")`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kepler_solve", exprs => coerced(exprs.head, exprs(1)), "built-in")
}
