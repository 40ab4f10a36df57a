package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expressions.DotProduct

/** General distributed k-means (Lloyd) over an embedding column — the
  * clustering operator behind semantic corpus organization (topic
  * bucketing, cluster-balanced sampling, semantic-dedup prefilters) and
  * the generalized form of the IVF/PQ trainers (Quantize.trainCodebook
  * runs the same loop per subspace at fixed iterations).
  *
  * What this adds over the fixed-round trainer: convergence monitoring
  * (stop when the max centroid shift drops under `tol`), per-cluster
  * sizes, and the final inertia (within-cluster sum of squared
  * distances) — the quantities you need to pick k and trust a clustering.
  *
  * Scale shape per iteration (identical to MLlib's, minus its RDD API):
  * centroids broadcast (k small arrays), assignment is a per-row argmin
  * via the packed-long ArgMaxPack HASH aggregate (no shuffle of vectors
  * beyond the one groupBy on id), update is one map-side-combining
  * aggregate keyed on (cluster, component). The driver loop holds only
  * k×dim doubles per round (the centroid check) — the vectors never
  * leave the executors. Deterministic: smallest-id init, exact decimal
  * centroid means, ties to the smaller cluster id.
  */
object KMeans {

  /** Fitted model: `centroids` = (cluster, centroid, size), plus how the
    * loop ended. `inertia` is the final within-cluster SSE. */
  final case class Model(centroids: DataFrame, iterations: Int,
                         converged: Boolean, inertia: Double)

  /** One Lloyd pass per iteration until the max centroid shift < `tol`
    * or `maxIters` is hit. Input vectors are cached for the loop and
    * unpersisted before return. */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int,
          maxIters: Int = 20, tol: Double = 1e-6): Model = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    require(tol >= 0, s"tol must be >= 0, got $tol")

    // shape rows for Quantize.assignCodes: a single subspace 0
    val rows = df.select(col(idCol).as("id"), lit(0).as("subspace"),
      col(vecCol).cast("array<double>").as("vec")).cache()
    try {
      var centroids = rows
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("subspace").orderBy("id")))
        .filter(col("rn") <= k)
        .select(col("subspace"), (col("rn") - 1).cast("int").as("code"),
          col("vec").as("centroid"))
        .cache()
      var iter = 0
      var converged = false

      while (iter < maxIters && !converged) {
        iter += 1
        val assigned = Quantize.assignCodes(rows, centroids, "vec")
        val updated = assigned
          .select(col("subspace"), col("code"), posexplode(col("vec")).as(Seq("pos", "comp")))
          .groupBy("subspace", "code", "pos")
          .agg((sum(col("comp").cast("decimal(38,18)")).cast("double") / count(lit(1))).as("c"))
          .groupBy("subspace", "code")
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
            f => f.getField("c")).as("centroid"))
        // empty clusters keep their previous centroid (deterministic)
        val next = centroids
          .select(col("subspace"), col("code"), col("centroid").as("prev"))
          .join(updated, Seq("subspace", "code"), "left")
          .select(col("subspace"), col("code"),
            coalesce(col("centroid"), col("prev")).as("centroid"),
            col("prev"))
          .cache()
        // max centroid shift — a k-row aggregate, the only driver-visible
        // value per round
        val shift = next
          .agg(max(sqrt(Quantize.sqDist(col("centroid"), col("prev")))))
          .head().getDouble(0)
        val prev = centroids
        centroids = next.drop("prev").cache()
        prev.unpersist()
        next.unpersist()
        converged = shift < tol
      }

      val finalAssign = Quantize.assignCodes(rows, centroids, "vec")
        .join(broadcast(centroids.select(col("code"), col("centroid"))), Seq("code"))
        .withColumn("d2", Quantize.sqDist(col("vec"), col("centroid")))
      val stats = finalAssign
        .agg(sum(col("d2").cast("decimal(38,18)")).cast("double").as("inertia"))
        .head()
      val sizes = finalAssign.groupBy("code").agg(count(lit(1)).as("size"))
      val out = centroids
        .join(sizes, Seq("code"), "left")
        .select(col("code").as("cluster"), col("centroid"),
          coalesce(col("size"), lit(0L)).as("size"))
      Model(out, iter, converged, stats.getDouble(0))
    } finally rows.unpersist()
  }

  /** Nearest-centroid assignment of (possibly new) vectors against a
    * fitted model: (id, cluster, d2). Broadcast centroids, per-row
    * argmin, no shuffle of the vector table beyond the id groupBy. */
  def assign(df: DataFrame, idCol: String, vecCol: String,
             centroids: DataFrame): DataFrame = {
    val rows = df.select(col(idCol).as("id"), lit(0).as("subspace"),
      col(vecCol).cast("array<double>").as("vec"))
    val cb = centroids.select(col("cluster").as("code"), col("centroid"))
      .withColumn("subspace", lit(0))
    Quantize.assignCodes(rows, cb, "vec")
      .join(broadcast(cb.drop("subspace")), Seq("code"))
      .withColumn("d2", Quantize.sqDist(col("vec"), col("centroid")))
      .select(col("id"), col("code").as("cluster"), col("d2"))
  }

  private[operators] def norm2(a: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sqrt(DotProduct.of(a, a))
}
