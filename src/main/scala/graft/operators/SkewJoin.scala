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
}
