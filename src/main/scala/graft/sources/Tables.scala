package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Typed loaders for the driver's parquet tables.
  *
  * Always load through these so column pruning + filter pushdown reach the
  * parquet scan (callers `.select` only what they need; Spark prunes the
  * rest). At 100 TB these tables would be partitioned/bucketed — loaders
  * keep that decision in one place.
  */
object Tables {
  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** `ts` is parquet TIMESTAMP(NANOS), which Spark has no native type for;
    * the loader forces spark.sql.legacy.parquet.nanosAsLong (runtime-
    * settable, so callers with their own sessions also work) and converts
    * to micros TimestampType (the driver data is micro-aligned, so the
    * conversion is lossless). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Spread per-row-heavy work across cores when the scan arrived with too
    * few splits to feed them (a small local parquet file is ONE split,
    * serializing e.g. a 30-iteration Newton solve or per-doc string
    * munging onto a single task). On a cluster the scan is already
    * parallel (many files/splits) and this is a no-op — no extra shuffle
    * at scale. The probe counts input FILES (cheap plan walk) rather than
    * calling df.rdd, which would force full physical planning + RDD DAG
    * construction per query build; an in-memory relation (no files) also
    * gets the repartition, which is harmless at test sizes. */
  def parallelized(df: DataFrame, keyCol: String): DataFrame = {
    val files = df.inputFiles.length
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (files * 2 < cores) df.repartition(org.apache.spark.sql.functions.col(keyCol)) else df
  }
}
