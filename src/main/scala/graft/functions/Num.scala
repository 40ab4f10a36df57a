package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric helpers shared by the query catalog.
  *
  * Exactness policy: floating-point SUM/AVG is order-dependent, so any
  * aggregate compared against the DuckDB oracle goes through
  * DECIMAL(38,6) — exact, commutative, identical in both engines — and is
  * cast back to double at the end. Per-row double arithmetic is IEEE-754
  * deterministic in both engines and needs no special handling.
  */
object Num {

  /** Per-row cast type: scale 6 like the oracle's DECIMAL(38,6) — the
    * rounded values are identical because rounding depends only on the
    * scale — but precision 18 so Spark's Decimal stays in its compact
    * unscaled-long representation instead of BigDecimal (the sum result
    * widens to DECIMAL(28,6): exact up to 1e22, far above any group sum —
    * 1e12 rows × 1e6 magnitude = 1e18). Inputs must fit 12 integer
    * digits, which every measure column here does by orders of
    * magnitude. */
  private val DecT = "decimal(18,6)"

  /** Order-independent exact sum: cast each double to scale-6 decimal, sum
    * exactly, return as double. */
  def dsum(c: Column): Column =
    sum(c.cast(DecT)).cast("double")

  /** Exact average via decimal sum / count. */
  def davg(c: Column): Column =
    (sum(c.cast(DecT)).cast("double") / count(c)).cast("double")

  /** Exact population variance via decimal moments:
    * E[x^2] - E[x]^2 computed from exact sums (deterministic across engines,
    * unlike built-in var_pop over doubles which is order-dependent).
    * The squared moment keeps the wide DECIMAL(38,6) cast: v² reaches 1e12
    * already at |v| = 1e6, which would overflow the compact type. */
  def dvarPop(c: Column): Column = {
    val n  = count(c).cast("double")
    val s  = sum(c.cast(DecT)).cast("double")
    val s2 = sum((c * c).cast("decimal(38,6)")).cast("double")
    (s2 / n) - (s / n) * (s / n)
  }

  /** Exact population stddev from decimal moments. */
  def dstddevPop(c: Column): Column = sqrt(dvarPop(c))
}
