package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column math over `array<float>` columns.
  *
  * Two paths:
  *  - `dot`/`cosine`: the native codegen'd `DotProduct` expression —
  *    per-row, no shuffle, whole-stage-codegen; the production path.
  *  - `dotExact`/`cosineExact`: an interpreted fold with a DECIMAL(38,18)
  *    accumulator. Decimal addition is exact hence order-independent, so
  *    results are bit-identical to any engine that sums the same products
  *    — kept for oracle-parity variants and as the reference for specs
  *    bounding the double path's rounding (≤ a few ulps).
  */
object VectorFns {

  private val DecT = "decimal(38,18)"

  def dot(a: Column, b: Column): Column =
    graft.expressions.DotProduct.of(a, b)

  def dotExact(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") * y.cast("double")).cast(DecT)),
      lit(java.math.BigDecimal.ZERO).cast(DecT),
      (acc, v) => (acc + v).cast(DecT),
    ).cast("double")

  def normExact(a: Column): Column = sqrt(dotExact(a, a))

  def cosineExact(a: Column, b: Column): Column =
    dotExact(a, b) / (normExact(a) * normExact(b))

  /** Unit-normalize a vector column into `outCol`. Pre-normalizing the
    * stored embeddings turns every ANN cosine into a plain dot — halving
    * per-candidate work and dropping the norm columns from the scan. A
    * zero vector stays zero (null division would poison every downstream
    * dot).
    *
    * DataFrame-level ON PURPOSE: the norm must be a materialized per-row
    * column so the divide lambda references it as an attribute — a pure
    * Column form would embed the sqrt(dot(a,a)) subtree inside the
    * transform lambda, and higher-order lambdas re-evaluate embedded
    * subtrees PER ELEMENT (an O(d²) normalization for d-dim vectors). */
  def normalized(df: org.apache.spark.sql.DataFrame, vecCol: String,
                 outCol: String): org.apache.spark.sql.DataFrame = {
    // collision-free temp name: never clobber/drop a user column
    val nrm = Iterator.from(0).map(i => s"__nrm$i")
      .find(n => !df.columns.contains(n)).get
    df.withColumn(nrm, sqrt(dot(col(vecCol), col(vecCol))))
      .withColumn(outCol,
        when(col(nrm) === 0.0, col(vecCol).cast("array<double>"))
          .otherwise(transform(col(vecCol).cast("array<double>"), x => x / col(nrm))))
      .drop(nrm)
  }

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Sign-LSH bucket from the first `bits` components: bit i set when
    * component i > 0. Cheap, deterministic, engine-portable. */
  def signBucket(a: Column, bits: Int = 4): Column =
    (0 until bits).map { i =>
      when(element_at(a, i + 1) > 0.0f, lit(1L << (bits - 1 - i))).otherwise(0L)
    }.reduce(_ + _)

  /** Random-hyperplane sign-LSH bucket: bit i set when a · h_i > 0, with
    * `bits` hyperplanes drawn from a deterministic seeded RNG and inlined
    * as array literals — each bit is one native DotProduct against a
    * constant, so the whole bucket stays in whole-stage codegen. Unlike
    * `signBucket` (single fixed projection), different seeds give
    * independent bucketings for multi-table LSH recall. */
  def planeBucket(a: Column, bits: Int, seed: Int, dim: Int = 64): Column = {
    val rng = new scala.util.Random(seed.toLong * 0x9E3779B97F4A7C15L + 1L)
    (0 until bits).map { i =>
      val plane = Array.fill(dim)(rng.nextGaussian())
      val h = lit(plane) // array<double> literal
      when(graft.expressions.DotProduct.of(a, h) > 0.0, lit(1L << (bits - 1 - i))).otherwise(0L)
    }.reduce(_ + _)
  }
}
