package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Num._

/** Recall evaluation for approximate-nearest-neighbor search — the
  * measurement half every ANN deployment needs before trusting an index
  * (the reference's corpus-quality ethos applied to graft's own C-family
  * indexes: q39's sign-LSH buckets, q46's IVF probe, q123/q126's IVF+PQ
  * all trade recall for cost, and this operator is how that trade gets
  * MEASURED instead of assumed).
  *
  * Scale shape: recall is evaluated on a bounded QUERY SAMPLE (the
  * standard methodology — exact ground truth costs sample × corpus, so
  * the sample, not the corpus, is the knob). Both inputs arrive as
  * (query, neighbor) result sets that are ≤ k rows per query by
  * construction; everything here is equi-joins and aggregations on those
  * k·|sample|-bounded tables — the evaluation never touches the corpus
  * itself. No floating-point comparisons enter the match: membership is
  * by neighbor ID, so near-tie cosine jitter between the two systems
  * cannot flip a hit into a miss unless the returned SET actually
  * differs.
  */
object AnnEval {

  /** Per-query recall of `approx` against the `exact` ground truth:
    * `n_exact` ground-truth neighbors, `n_hit` of them returned by the
    * approximate search, `recall = n_hit / n_exact`. Queries the
    * approximate side missed entirely (e.g. an empty LSH bucket) surface
    * with `n_hit = 0`, not as absent rows — silent misses are the
    * failure mode an evaluation exists to expose. Extra approx-side
    * columns (cosine, rank, bucket) are ignored; only the ID pair set
    * matters. */
  def recallAt(exact: DataFrame, approx: DataFrame,
               qCol: String = "q_id", tCol: String = "t_id"): DataFrame = {
    val ex = exact.select(col(qCol).as("q_id"), col(tCol).as("t_id"))
    val ap = approx.select(col(qCol).as("q_id"), col(tCol).as("t_id"))
    val hits = ex.join(ap, Seq("q_id", "t_id"), "left_semi")
      .groupBy("q_id").agg(count(lit(1)).as("n_hit"))
    ex.groupBy("q_id").agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("q_id"), "left")
      .na.fill(0L, Seq("n_hit"))
      .withColumn("recall",
        col("n_hit").cast("double") / col("n_exact").cast("double"))
  }

  /** Collapse a `recallAt` table to the headline numbers: macro mean
    * recall (each query weighted equally — the number ANN papers report),
    * micro recall (total hits / total truth), and the worst query.
    * Decimal-exact sums so the summary is partitioning-independent. */
  def summarize(perQuery: DataFrame): DataFrame =
    perQuery.agg(
      count(lit(1)).as("n_queries"),
      (dsum(col("recall")) / count(lit(1)).cast("double")).as("macro_recall"),
      (dsum(col("n_hit").cast("double")) / dsum(col("n_exact").cast("double")))
        .as("micro_recall"),
      min(col("recall")).as("worst_recall"))
}
