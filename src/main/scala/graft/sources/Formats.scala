package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Multi-format source/sink helpers. Parquet is the native format;
  * CSV/JSON exist for interchange (the reference emits CSV lookup tables
  * and JSON results). Schema is always supplied explicitly on read —
  * inference is a full extra pass at 100 TB and non-deterministic.
  */
object Formats {

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Partitioned parquet sink: repartition by the partition columns first
    * so each output directory gets coherent files instead of one file per
    * (task × partition-value) — the difference between 32 and 32,000
    * files per day at cluster scale. */
  def writePartitionedParquet(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.repartition(partitionCols.map(df.col): _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Bucketed managed table: pre-shuffles data into `n` hash buckets on
    * `bucketCol` at write time, so later equi-joins between tables
    * bucketed the same way need NO exchange at read time — the key lever
    * for repeated fact-fact joins at 100 TB (pay the shuffle once). */
  def writeBucketedTable(df: DataFrame, table: String, bucketCol: String, n: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(n, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table) // managed table under spark.sql.warehouse.dir
}
