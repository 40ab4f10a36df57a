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
    * path is faster. Ties broken by target id. */
  def bruteForce(queries: DataFrame, targets: DataFrame, vecCol: String, idCol: String,
                 k: Int, exact: Boolean = false): DataFrame = {
    val q = broadcast(withNorm(queries, idCol, vecCol, "q_id", "q_vec", "q_norm", exact))
    val t = withNorm(targets, idCol, vecCol, "t_id", "t_vec", "t_norm", exact)
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("t_id"))
    t.crossJoin(q)
      .withColumn("cosine", pairCosine(exact))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "t_id", "cosine", "rank")
  }

  /** Top-k per query within the query's sign-LSH bucket. */
  def bucketed(queries: DataFrame, targets: DataFrame, vecCol: String, idCol: String,
               k: Int, bits: Int = 4, exact: Boolean = false): DataFrame = {
    val q = broadcast(withNorm(queries, idCol, vecCol, "q_id", "q_vec", "q_norm", exact)
      .withColumn("bucket", VectorFns.signBucket(col("q_vec"), bits)))
    val t = withNorm(targets, idCol, vecCol, "t_id", "t_vec", "t_norm", exact)
      .withColumn("bucket", VectorFns.signBucket(col("t_vec"), bits))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("t_id"))
    t.join(q, Seq("bucket"))
      .filter(col("q_id") =!= col("t_id"))
      .withColumn("cosine", pairCosine(exact))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "t_id", "cosine", "rank", "bucket")
  }
}
