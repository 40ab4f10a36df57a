package graft.operators

import org.apache.spark.sql.DataFrame
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
  */
object KnnJoin {

  /** Top-k targets per query by cosine. `exact = true` uses the
    * decimal-accumulator cosine (DuckDB-parity); default double path is
    * faster. Ties broken by target id. */
  def bruteForce(queries: DataFrame, targets: DataFrame, vecCol: String, idCol: String,
                 k: Int, exact: Boolean = false): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec")))
    val t = targets.select(col(idCol).as("t_id"), col(vecCol).as("t_vec"))
    val cos = if (exact) VectorFns.cosineExact(col("q_vec"), col("t_vec"))
              else VectorFns.cosine(col("q_vec"), col("t_vec"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("t_id"))
    t.crossJoin(q)
      .withColumn("cosine", cos)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "t_id", "cosine", "rank")
  }

  /** Top-k per query within the query's sign-LSH bucket. */
  def bucketed(queries: DataFrame, targets: DataFrame, vecCol: String, idCol: String,
               k: Int, bits: Int = 4, exact: Boolean = false): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      VectorFns.signBucket(col(vecCol), bits).as("bucket")))
    val t = targets.select(
      col(idCol).as("t_id"), col(vecCol).as("t_vec"),
      VectorFns.signBucket(col(vecCol), bits).as("bucket"))
    val cos = if (exact) VectorFns.cosineExact(col("q_vec"), col("t_vec"))
              else VectorFns.cosine(col("q_vec"), col("t_vec"))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("t_id"))
    t.join(q, Seq("bucket"))
      .filter(col("q_id") =!= col("t_id"))
      .withColumn("cosine", cos)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "t_id", "cosine", "rank", "bucket")
  }
}
