package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column math over `array<float>` columns.
  *
  * Two paths:
  *  - `dot`/`cosine`: double-precision `zip_with` + `aggregate` fold —
  *    per-row, no shuffle, codegen-adjacent; the production path.
  *  - `dotExact`/`cosineExact`: the same fold with a DECIMAL(38,18)
  *    accumulator. Decimal addition is exact hence order-independent, so
  *    results are bit-identical to any engine that sums the same products
  *    — this is the DuckDB-parity path used by the oracle queries.
  */
object VectorFns {

  private val DecT = "decimal(38,18)"

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v,
    )

  def dotExact(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") * y.cast("double")).cast(DecT)),
      lit(java.math.BigDecimal.ZERO).cast(DecT),
      (acc, v) => (acc + v).cast(DecT),
    ).cast("double")

  def normExact(a: Column): Column = sqrt(dotExact(a, a))

  def cosineExact(a: Column, b: Column): Column =
    dotExact(a, b) / (normExact(a) * normExact(b))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Sign-LSH bucket from the first `bits` components: bit i set when
    * component i > 0. Cheap, deterministic, engine-portable. */
  def signBucket(a: Column, bits: Int = 4): Column =
    (0 until bits).map { i =>
      when(element_at(a, i + 1) > 0.0f, lit(1L << (bits - 1 - i))).otherwise(0L)
    }.reduce(_ + _)
}
