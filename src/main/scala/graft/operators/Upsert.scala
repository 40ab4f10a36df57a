package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture materialization: turn an append-only change stream
  * into (a) the latest-state snapshot per key and (b) SCD-2 validity
  * intervals. The reference's PSRDB layer answers "current processing
  * state per observation" queries over exactly this shape (README
  * "Database management"); a training-data lakehouse needs the same two
  * views over document/metadata change logs.
  */
object Upsert {

  /** Latest row per key: the change with the greatest `versionCols` tuple
    * wins (include a unique tiebreak column — e.g. an event id — so the
    * winner is total-ordered and deterministic under re-partitioning).
    *
    * Rides the TopKPerKey physical operator with k = 1: per-partition
    * bounded heaps hold ONE row per key before the shuffle, so the
    * exchange carries at most (#partitions × #keys) rows regardless of
    * change-log depth — the right shape for a 100 TB log compacting to a
    * much smaller key space. A window row_number formulation would sort
    * every partition; `max_by(struct(...))` falls back to SortAggregate
    * (struct buffers aren't hash-aggregable).
    */
  def latest(changes: DataFrame, keyCols: Seq[String], versionCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "latest needs at least one key column")
    require(versionCols.nonEmpty, "latest needs at least one version column")
    graft.plans.TopK.perKey(
      changes, keyCols, versionCols.map(graft.plans.TopK.desc), k = 1)
  }

  /** Apply an insert/update/delete change log to a prior snapshot — the
    * MERGE INTO materialization: rows = snapshot ∪ changes, the greatest
    * `versionCols` tuple per key wins, and a winning row whose `opCol`
    * equals `deleteOp` drops the key from the result (a later re-insert
    * revives it, because only the WINNER's op decides). Snapshot rows
    * must carry their original version and a non-delete op, so a stale
    * change arriving after compaction still loses to the stored state.
    *
    * Same plan shape as [[latest]] (TopKPerKey k=1 over the union):
    * compacting a day's change log against a 100 TB snapshot is one
    * bounded-heap pass + the key-space shuffle — never a window sort. */
  def applyChangeLog(snapshot: DataFrame, changes: DataFrame,
                     keyCols: Seq[String], versionCols: Seq[String],
                     opCol: String, deleteOp: String = "D"): DataFrame =
    // null-safe: a winner with a NULL op (e.g. snapshot rows that carry
    // no change-op) must SURVIVE the delete filter, not silently vanish
    latest(snapshot.unionByName(changes), keyCols, versionCols)
      .filter(!(col(opCol) <=> lit(deleteOp)))

  /** SCD-2 validity intervals from a change stream: each change row gains
    * `valid_from` (its own `tsCol`), `valid_to` (the NEXT change's ts for
    * the same key, null while current) and `is_current`. Half-open
    * intervals [valid_from, valid_to): a lookup at time t matches
    * valid_from <= t < coalesce(valid_to, +inf) — the same as-of
    * semantics as `AsOfJoin`, precomputed into joinable columns.
    *
    * One per-key window with a (ts, tiebreak) total order — O(n log n)
    * per key, no self-join. Ties on ts (same-instant updates) are ordered
    * by `tieCol`, so the earlier change gets a zero-width interval rather
    * than a nondeterministic one.
    */
  def scd2(changes: DataFrame, keyCols: Seq[String], tsCol: String,
           tieCol: String): DataFrame = {
    require(keyCols.nonEmpty, "scd2 needs at least one key column")
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
