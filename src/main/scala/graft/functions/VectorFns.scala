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

  /** One hash-derived standard-normal draw: md5 of the tag supplies two
    * 53-bit uniforms (u1 ∈ (0,1] so the log is finite, u2 ∈ [0,1)),
    * combined by Box–Muller z = √(−2 ln u1)·cos(2π u2). A pure function
    * of the tag string through a UNIVERSAL hash — any engine or language
    * regenerates the identical plane from md5 alone, unlike a JVM
    * `Random.nextGaussian` stream (polar method + hidden generator
    * state), which made the multi-table LSH mode engine-private. */
  private[graft] def hashGaussian(tag: String): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(tag.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val bb = java.nio.ByteBuffer.wrap(md) // big-endian
    val u1 = ((bb.getLong >>> 11).toDouble + 1.0) / (1L << 53).toDouble
    val u2 = (bb.getLong >>> 11).toDouble / (1L << 53).toDouble
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }

  /** The deterministic hyperplane behind [[planeBucket]] bit `i`:
    * component j = [[hashGaussian]] of `graft-plane:<seed>:<i>:<j>`. */
  private[graft] def planeFor(seed: Int, i: Int, dim: Int): Array[Double] =
    Array.tabulate(dim)(j => hashGaussian(s"graft-plane:$seed:$i:$j"))

  /** Random-hyperplane sign-LSH bucket: bit i set when a · h_i > 0, with
    * `bits` hyperplanes derived per-component from md5 Box–Muller
    * ([[hashGaussian]] — engine-portable, reproducible from the seed in
    * ANY system with md5) and inlined as array literals — each bit is
    * one native DotProduct against a constant, so the whole bucket stays
    * in whole-stage codegen. Unlike `signBucket` (single fixed
    * projection), different seeds give independent bucketings for
    * multi-table LSH recall. */
  def planeBucket(a: Column, bits: Int, seed: Int, dim: Int = 64): Column =
    (0 until bits).map { i =>
      val h = lit(planeFor(seed, i, dim)) // array<double> literal
      when(graft.expressions.DotProduct.of(a, h) > 0.0, lit(1L << (bits - 1 - i))).otherwise(0L)
    }.reduce(_ + _)
}
