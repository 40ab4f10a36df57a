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

  /** Order-independent exact sum: cast each double to DECIMAL(38,6), sum
    * exactly, return as double. */
  def dsum(c: Column): Column =
    sum(c.cast("decimal(38,6)")).cast("double")

  /** Exact average via decimal sum / count. */
  def davg(c: Column): Column =
    (sum(c.cast("decimal(38,6)")).cast("double") / count(c)).cast("double")

  /** Exact population variance via decimal moments:
    * E[x^2] - E[x]^2 computed from exact sums (deterministic across engines,
    * unlike built-in var_pop over doubles which is order-dependent). */
  def dvarPop(c: Column): Column = {
    val n  = count(c).cast("double")
    val s  = sum(c.cast("decimal(38,6)")).cast("double")
    val s2 = sum((c * c).cast("decimal(38,6)")).cast("double")
    (s2 / n) - (s / n) * (s / n)
  }

  /** Exact population stddev from decimal moments. */
  def dstddevPop(c: Column): Column = sqrt(dvarPop(c))
}
