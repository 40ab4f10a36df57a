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
  /** `ts` arrives in whatever physical parquet type the driver generated
    * that round — TIMESTAMP(NANOS) in rounds 1-5 (no native Spark type;
    * the loader forces spark.sql.legacy.parquet.nanosAsLong and converts
    * the long to micros TimestampType, losslessly — the data is
    * micro-aligned), TIMESTAMP(MICROS) naive since round 6 (reads as
    * TIMESTAMP_NTZ; cast to session-UTC TimestampType keeps the same
    * micros-since-epoch). Normalizing HERE means every consumer sees one
    * stable TimestampType column whichever file vintage it reads.
    *
    * The NTZ branch is timezone-INVARIANT: the naive value is UTC wall
    * clock, so its epoch micros are computed ARITHMETICALLY from the
    * wall-clock fields (days-since-epoch × 86.4e9 + intra-day micros) —
    * no session-timezone interpretation anywhere, so the result is
    * exact on ANY session including inside DST transitions (the earlier
    * convert_timezone('UTC', session, ..)-then-cast round trip shifted
    * instants landing in a non-UTC session's repeated fall-back hour by
    * one hour: the cast resolves the ambiguous local time to one
    * offset, and a bare `cast(ts as timestamp)` shifts everything). On
    * a UTC session the cast IS the identity and the per-row field
    * extraction is not free (the zone-arithmetic form measured 5.6x ->
    * 7.5x on events-heavy sf1 slopes), so the plain cast fast path is
    * taken. */
  private[graft] val ntzToUtcTimestamp =
    "timestamp_micros(" +
      "cast(datediff(cast(ts as date), date'1970-01-01') as bigint) * 86400000000 + " +
      "cast(hour(ts) as bigint) * 3600000000 + " +
      "cast(minute(ts) as bigint) * 60000000 + " +
      "cast(date_part('SECOND', ts) * 1000000 as bigint))"

  /** Column form of the same timezone-free NTZ(UTC wall clock) → epoch
    * micros arithmetic, for operators that need the LONG axis value
    * (as-of distances, range binning) rather than a TimestampType. */
  private[graft] def ntzMicros(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    datediff(c.cast("date"), lit(java.sql.Date.valueOf("1970-01-01"))).cast("long") * lit(86400000000L) +
      hour(c).cast("long") * lit(3600000000L) +
      minute(c).cast("long") * lit(60000000L) +
      (date_part(lit("SECOND"), c) * lit(1000000)).cast("long")
  }
  private[graft] def sessionIsUtc(spark: SparkSession): Boolean =
    try java.time.ZoneId.of(spark.conf.get("spark.sql.session.timeZone"))
      .normalized() == java.time.ZoneOffset.UTC
    catch { case _: Throwable => false }
  private[graft] def ntzCastSql(spark: SparkSession): String =
    if (sessionIsUtc(spark)) "cast(ts as timestamp)" else ntzToUtcTimestamp
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", expr(ntzCastSql(spark)))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Spread floor for regex/explode-heavy text and vector scans, where
    * compressed bytes understate per-row work: well under the plain 8 MB
    * default, sized so sf1-scale text inputs spread (raw scan ~6 MB, and
    * a column-pruned projection's ESTIMATE drops to ~2.6 MB — the floor
    * must sit below the pruned estimate or projected call sites lose
    * their spread exactly where it pays; measured q97 1.4x -> 13x when a
    * 4 MB floor missed the pruned estimate) while sf0.1's sub-MB
    * estimates — where the exchange measured as a net loss — stay
    * unspread. */
  val TextHeavyMinBytes: Long = 2L << 20

  /** Spread per-row-heavy work across cores when the scan arrived with too
    * few splits to feed them (a small local parquet file is ONE split,
    * serializing e.g. a 30-iteration Newton solve or per-doc string
    * munging onto a single task). On a cluster the scan is already
    * parallel and this is a no-op — no extra shuffle at scale.
    *
    * The split count is estimated from the optimizer's size statistics /
    * maxPartitionBytes: a file COUNT would misjudge one large splittable
    * file as serial (forcing a full at-scale shuffle), and probing df.rdd
    * would pay physical planning + RDD DAG construction per query build. */
  def parallelized(df: DataFrame, keyCol: String,
                   minBytes: Long = 8L << 20): DataFrame = {
    // runtime kill switch (A/B experiments, emergency off on a deploy
    // where the exchange measures as a net loss): off = never spread
    if (sys.env.get("SPARK_GRAFT_SPREAD").contains("off")) return df
    val conf = df.sparkSession.sessionState.conf
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val estSplits = (bytes / BigInt(math.max(1L, conf.filesMaxPartitionBytes))) + 1
    val cores = df.sparkSession.sparkContext.defaultParallelism
    // Size floor: under ~8 MB the repartition exchange usually costs
    // more than the serial scan it parallelizes (measured: wrapping the
    // 6 MB sf0.1 embeddings table regressed the multi-pass dedup
    // pipelines that re-read it, while the same wrap on 60 MB+ inputs
    // won 3-7x). BYTES ARE A PROXY FOR WORK, and a bad one for heavily
    // compressed text whose per-row cost is regex/explode-bound — such
    // call sites pass TextHeavyMinBytes (2 MB): still spreading well
    // below the plain-scan floor (measured 4-7x on the tokenize-heavy
    // text queries at sf1, ~6 MB on disk) but NOT at sf0.1's sub-MB
    // inputs, where a round-7 on/off A/B (best-of-2 full-catalog runs,
    // SCALING.md) measured the exchange as a stable net LOSS on
    // multi-pass pipelines (q92 +0.84 s, q89b +0.27 s) against only
    // ~0.2 s of single-pass wins.
    val worthSpreading = bytes > BigInt(minBytes)
    if (worthSpreading && estSplits * 2 < cores)
      df.repartition(org.apache.spark.sql.functions.col(keyCol)) else df
  }
}
