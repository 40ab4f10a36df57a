package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join handles most runtime skew; this operator is the
  * explicit form for cases AQE can't split (e.g. a single hot key inside
  * one task's hash aggregate, or a deterministic plan requirement): left
  * rows scatter across `saltBuckets` sub-keys via a hash of a
  * distinguishing column, the right side is replicated once per bucket, so
  * the hot key's work spreads over `saltBuckets` tasks.
  */
object SkewJoin {

  /** @param scatterCol left-side column whose hash spreads the hot key's
    *        rows (any high-cardinality column, e.g. the event id). */
  def salted(left: DataFrame, right: DataFrame, key: String,
             scatterCol: String, saltBuckets: Int): DataFrame = {
    // saltBuckets = 0 would be pmod-by-zero (ANSI: runtime DIVIDE_BY_ZERO
    // deep in the job) and a DESCENDING sequence(0, -1) on the right
    require(saltBuckets >= 1, s"saltBuckets must be >= 1, got $saltBuckets")
    val l = left.withColumn("__salt", pmod(hash(col(scatterCol)), lit(saltBuckets)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Measure-then-route selective salting: keys whose LEFT-side row
    * count exceeds `heavyThreshold` go through the salted join (hot
    * work spread over `saltBuckets` tasks, right rows for those keys
    * replicated `saltBuckets`×); every other key takes the plain
    * equi-join with zero replication. [[salted]] alone replicates the
    * WHOLE right side — ruinous when only a handful of keys are hot,
    * which is what real skew looks like. Cost of the diagnosis: one
    * map-side-combining count over the left (its result is
    * keys-over-threshold sized → broadcast).
    *
    * Semantically identical to `left.join(right, key)` for any
    * threshold (spec-asserted): routing partitions the left rows by
    * heaviness, and a non-heavy left row can never match a heavy-only
    * right row under an equi-join. */
  def autoSalted(left: DataFrame, right: DataFrame, key: String,
                 scatterCol: String, saltBuckets: Int,
                 heavyThreshold: Long): DataFrame = {
    require(heavyThreshold >= 1, s"heavyThreshold must be >= 1, got $heavyThreshold")
    val heavy = broadcast(
      left.groupBy(col(key)).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > heavyThreshold)
        .select(col(key)))
    val plain = left.join(heavy, Seq(key), "left_anti")
      .join(right, Seq(key))
    val hot = salted(
      left.join(heavy, Seq(key), "left_semi"),
      right.join(heavy, Seq(key), "left_semi"),
      key, scatterCol, saltBuckets)
    plain.unionByName(hot)
  }

  /** Exact heavy-hitter report — the skew diagnosis run BEFORE choosing
    * a salting/bucketing strategy: the `k` most frequent key tuples with
    * their counts and share of all rows. One map-side-combining count
    * aggregate, then `orderBy(...).limit(k)` — which Spark plans as
    * TakeOrderedAndProject (per-partition bounded heap + driver merge of
    * k-row partials, never a global sort of the distinct keys). `share`
    * divides by the pre-aggregation row count. */
  def heavyHitters(df: DataFrame, keyCols: Seq[String], k: Int): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
    // grand total = sum of the per-key counts already in hand — a second
    // df.agg(count(*)) would re-scan the full (100 TB) input
    val total = broadcast(counts.agg(sum(col("n")).as("__total")))
    counts.crossJoin(total)
      .orderBy(col("n").desc +: keyCols.map(col(_).asc): _*)
      .limit(k)
      .withColumn("share", col("n").cast("double") / col("__total").cast("double"))
      .drop("__total")
  }
}
