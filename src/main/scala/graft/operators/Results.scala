package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-observation results rollup — the engine-level form of
  * `generate_results` (scripts/generate_images_results.py:256): assemble
  * named scalar metrics (zap fraction, DM fit values, S/N, flux) into one
  * results record per key, serializable as JSON.
  */
object Results {

  /** Pivot (key, metric, value) long-form metrics into one wide row per
    * key with a `results_json` column. Metric names become fields; missing
    * metrics are null (the reference writes nulls for raw-only runs). */
  def assemble(metrics: DataFrame, keyCol: String, nameCol: String, valueCol: String,
               metricNames: Seq[String]): DataFrame = {
    val wide = metrics
      .groupBy(col(keyCol))
      .pivot(nameCol, metricNames)
      .agg(first(col(valueCol)))
    // keep null fields: the reference's results dict carries None for
    // metrics a raw-only run didn't produce, serialized as JSON null
    wide.withColumn("results_json",
      to_json(struct(metricNames.map(col): _*), Map("ignoreNullFields" -> "false")))
  }
}
