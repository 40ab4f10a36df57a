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

  /** Per-row cast type. DECIMAL(38,6) handles |v| up to 1e32: a narrower
    * compact type (18,6) was tried for the unscaled-long fast path but
    * reverted — it cliffs at |v| = 1e12 (ANSI: CAST_OVERFLOW kills the
    * query; non-ANSI: the null'd cast makes davg silently skew because
    * count(c) still counts the row), and the speedup was not measurable
    * above run-to-run noise. Safety wins for a library-wide helper. */
  private val DecT = "decimal(38,6)"

  /** Order-independent exact sum: cast each double to scale-6 decimal, sum
    * exactly, return as double. */
  def dsum(c: Column): Column =
    sum(c.cast(DecT)).cast("double")

  /** Order-independent exact sum for INTEGER-VALUED doubles (the
    * integer-grid moment discipline, q128/q131/q133/q62/q65): cast to
    * scale-0 decimal, sum exactly, cast back. With scale 0 both engines
    * perform a SINGLE correctly-rounded integer→double conversion at the
    * end. The scale-6 path is NOT bitwise-safe above 2^53 unscaled:
    * DuckDB converts the int128 to double and THEN divides by 10^6 (two
    * roundings) — a measured 1-ulp divergence on ~25% of values above
    * 2^53, which χ²-style cancellations amplify. Callers must feed
    * integer-valued doubles; fractional inputs belong to `dsum`. */
  def dsumInt(c: Column): Column =
    sum(c.cast("decimal(38,0)")).cast("double")

  /** Integer-grid response in floor cents — the q128/q131 discipline's
    * standard transform for 2-decimal-place columns: `floor(c·100)` is
    * an integer-valued double both engines agree on bitwise, so moment
    * products stay exact integers and [[dsumInt]]'s contract holds.
    * NOTE: this is a deterministic quantization, NOT exact cents
    * recovery — for a 2-dp value stored as double, c·100.0 often lands
    * an ulp below the true integer (8.29·100.0 = 828.999…), so floor is
    * one low for roughly half of inputs. round() would recover the
    * exact cents but round-half semantics differ across engines
    * (HALF_UP vs half-away on the binary value); determinism on the
    * identical chain is the property the gate needs, so floor stays.
    * Keep [[centsSql]] in lockstep — they are the two halves of one
    * recipe. */
  def cents(c: Column): Column = floor(c * lit(100.0)).cast("double")

  /** The oracle-SQL mirror of [[cents]], for embedding in DuckDB oracle
    * text: identical IEEE chain (int→double promotion of the literal
    * 100 gives the same product). */
  def centsSql(column: String): String = s"CAST(FLOOR($column * 100) AS DOUBLE)"

  /** Exact average via decimal sum / count. */
  def davg(c: Column): Column =
    (sum(c.cast(DecT)).cast("double") / count(c)).cast("double")

  /** Exact population variance via decimal moments:
    * E[x^2] - E[x]^2 computed from exact sums (deterministic across engines,
    * unlike built-in var_pop over doubles which is order-dependent). */
  def dvarPop(c: Column): Column = {
    val n  = count(c).cast("double")
    val s  = sum(c.cast(DecT)).cast("double")
    val s2 = sum((c * c).cast(DecT)).cast("double")
    (s2 / n) - (s / n) * (s / n)
  }

  /** Exact population stddev from decimal moments. */
  def dstddevPop(c: Column): Column = sqrt(dvarPop(c))

  // -------------------------------------------------------------------
  // Production twins: plain double aggregates, same shapes as the d*
  // versions. Decimal(38,6) sums cost ~10× a double sum (128-bit adds +
  // per-row casts on the aggregation hot path); that price buys the
  // bit-exact DuckDB parity the oracle gate needs, but an engine user
  // who accepts float-sum order-dependence should get native speed. The
  // oracle-checked catalog stays on d*; operators and the bench's
  // `fast` variants use f*. (Same pairing as minhashLsh/minhashLshFast.)
  // -------------------------------------------------------------------

  /** Production sum (IEEE double accumulation, order-dependent). */
  def fsum(c: Column): Column = sum(c)

  /** Production average. */
  def favg(c: Column): Column = avg(c)

  /** Production population variance. */
  def fvarPop(c: Column): Column = var_pop(c)

  /** Production population stddev. */
  def fstddevPop(c: Column): Column = stddev_pop(c)
}
