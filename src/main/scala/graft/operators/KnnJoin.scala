package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Approximate-nearest-neighbor joins over an embedding column.
  *
  * `bruteForce` is the exactness baseline: broadcast the (small) query set
  * against all targets — per-row cosine, one window shuffle for top-k.
  * `bucketed` is the scale path: sign-LSH blocking makes the pair join
  * bucket-local so target rows are only compared against queries landing in
  * the same bucket.
  *
  * Norms are precomputed once per vector before the pair join (3x fewer
  * array folds than a naive per-pair cosine).
  */
object KnnJoin {

  private def withNorm(df: DataFrame, idCol: String, vecCol: String, idAs: String,
                       vecAs: String, normAs: String, exact: Boolean): DataFrame = {
    val n = if (exact) VectorFns.normExact(col(vecCol)) else sqrt(VectorFns.dot(col(vecCol), col(vecCol)))
    df.select(col(idCol).as(idAs), col(vecCol).as(vecAs), n.as(normAs))
  }

  private def pairCosine(exact: Boolean): Column = {
    val d = if (exact) VectorFns.dotExact(col("q_vec"), col("t_vec"))
            else VectorFns.dot(col("q_vec"), col("t_vec"))
    d / (col("q_norm") * col("t_norm"))
  }

  /** Top-k targets per query by cosine. `exact = true` uses the
    * decimal-accumulator dot product (DuckDB-parity); the default double
    * path is the native codegen'd DotProduct. Ties broken by target id.
    * Self-pairs (same id on both sides) are excluded, matching `bucketed`.
    *
    * The rank-filter idiom below is rewritten by RankFilterToTopK (installed
    * here) into the bounded-heap TopKPerKey operator: at most k rows per
    * (input partition, query) reach the shuffle instead of the full pair
    * set, and no per-key sort buffer is materialized. */
  def bruteForce(queries: DataFrame, targets: DataFrame, vecCol: String, idCol: String,
                 k: Int, exact: Boolean = false): DataFrame = {
    graft.plans.RankFilterToTopK_Install(queries.sparkSession)
    val q = broadcast(withNorm(queries, idCol, vecCol, "q_id", "q_vec", "q_norm", exact))
    val t = withNorm(targets, idCol, vecCol, "t_id", "t_vec", "t_norm", exact)
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("t_id"))
    t.crossJoin(q)
      .filter(col("q_id") =!= col("t_id"))
      .withColumn("cosine", pairCosine(exact))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "t_id", "cosine", "rank")
  }

  /** Top-k per query within the query's sign-LSH bucket(s).
    *
    * Scale shape: `bits` must grow with data size so bucket population
    * stays bounded (use `bitsFor`); `tables` independent bucketings trade
    * recall against candidate count (multi-table LSH). The same
    * rank-filter→TopKPerKey rewrite as `bruteForce` bounds the top-k. */
  def bucketed(queries: DataFrame, targets: DataFrame, vecCol: String, idCol: String,
               k: Int, bits: Int = 4, exact: Boolean = false, tables: Int = 1): DataFrame = {
    graft.plans.RankFilterToTopK_Install(queries.sparkSession)
    require(tables >= 1, "tables must be >= 1")
    val q0 = withNorm(queries, idCol, vecCol, "q_id", "q_vec", "q_norm", exact)
    val t0 = withNorm(targets, idCol, vecCol, "t_id", "t_vec", "t_norm", exact)
    // Table 0 keeps the component-sign bucket (engine/oracle parity);
    // further tables use seeded random-hyperplane signs. Bucket value
    // spaces are made disjoint across tables by a table-index offset.
    def bucketsOf(df: DataFrame, vec: String): DataFrame = {
      val bcols = (0 until tables).map { tab =>
        val b = if (tab == 0) VectorFns.signBucket(col(vec), bits)
                else VectorFns.planeBucket(col(vec), bits, seed = tab)
        (b + lit(tab.toLong << 32)).as(s"b$tab")
      }
      df.withColumn("bucket", explode(array(bcols: _*)))
    }
    val q = broadcast(bucketsOf(q0, "q_vec"))
    val t = bucketsOf(t0, "t_vec")
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("t_id"))
    val pairs = t.join(q, Seq("bucket"))
      .filter(col("q_id") =!= col("t_id"))
    val distinctPairs =
      if (tables == 1) pairs
      else pairs.dropDuplicates("q_id", "t_id") // union of tables → dedup candidates
    distinctPairs
      .withColumn("cosine", pairCosine(exact))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "t_id", "cosine", "rank", "bucket")
  }

  /** Bucket-bit count sized so expected bucket population ~ `perBucket`:
    * ceil(log2(n / perBucket)), clamped to [4, 24]. At 100 TB (n ~ 1e9+)
    * this yields millions of buckets, keeping within-bucket pair joins
    * linear instead of the fixed-16-bucket quadratic blowup. */
  def bitsFor(n: Long, perBucket: Long = 1024L): Int = {
    val target = math.max(1L, n / math.max(1L, perBucket))
    val b = math.ceil(math.log(target.toDouble) / math.log(2.0)).toInt
    math.min(24, math.max(4, b))
  }
}
