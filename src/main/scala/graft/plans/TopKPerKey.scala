package graft.plans

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.Bridge

/** Custom whole-operator: top-k rows per key by a sort order.
  *
  * The DataFrame-API formulation (window `row_number` + filter) must fully
  * sort every key-partition before it can rank; this operator keeps a
  * bounded k-row heap per key instead — O(n log k) with no sort buffer or
  * spill — and runs in two phases like a partial aggregate: a map-side
  * partial top-k before the shuffle, so at most `k` rows per (partition,
  * key) cross the wire, then a final top-k after clustering by key.
  *
  * Engine analog: "best N TOAs per pulsar" PSRDB queries; also the top-k
  * stage of ANN search.
  */
final case class TopKPerKeyPlan(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    rankAttr: Option[Attribute] = None,
) extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ rankAttr
  // rankAttr is minted here, not derived from the child — without this
  // CheckAnalysis flags MISSING_ATTRIBUTES on the replaced Window's rank.
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

/** Planner strategy: partial top-k → (exchange inserted by requirement) →
  * final top-k. Only the final phase emits the rank column (when asked):
  * partial-phase survivors aren't final ranks. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child, rankAttr) =>
      val partial = TopKPerKeyExec(keys, order, k, partial = true, None, planLater(child))
      TopKPerKeyExec(keys, order, k, partial = false, rankAttr, partial) :: Nil
    case _ => Nil
  }
}

final case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    rankAttr: Option[Attribute],
    child: SparkPlan,
) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  // Rows pass through unchanged, so the child's partitioning survives —
  // without this the Window above a rank-filter rewrite would see
  // UnknownPartitioning and insert a second, redundant exchange.
  override def outputPartitioning = child.outputPartitioning

  /** Map-side heap-count cap for the PARTIAL phase: when a task sees more
    * distinct keys than this, the current heaps are flushed downstream
    * and the map restarts — partial pruning is advisory (the final phase
    * enforces exact top-k), so a flush trades pruning for bounded memory
    * exactly like HashAggregate's fallback. The FINAL phase is exact and
    * must hold one k-row heap per key in its partition: O(keys·k) rows,
    * which is never more than the rows a window sort would buffer. */
  private val MaxPartialHeaps = 1 << 16

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val kk = k
    val isPartial = partial
    val rankOut = rankAttr
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = GenerateOrdering.generate(sortOrder, childOutput)
      // heap root = worst kept row (reverse order), evicted on better rows
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, java.util.PriorityQueue[InternalRow]]
      val flushed = mutable.ArrayBuffer.empty[InternalRow]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            if (isPartial && heaps.size >= MaxPartialHeaps) {
              // bounded-memory fallback: emit current partial results
              heaps.valuesIterator.foreach(h => flushed ++= h.iterator.asScala)
              heaps.clear()
            }
            val h = new java.util.PriorityQueue[InternalRow](kk,
              (a: InternalRow, b: InternalRow) => ord.compare(b, a))
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kk) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      rankOut match {
        case None =>
          flushed.iterator ++ heaps.valuesIterator.flatMap(_.iterator.asScala)
        case Some(attr) =>
          // Final phase replacing a row_number Window: emit each key's ≤k
          // survivors in sort order with their rank appended. Sorting k
          // rows per key is O(keys·k log k) — the cost the rewrite saves
          // is the O(n log n) sort of ALL candidate rows.
          val outProj = UnsafeProjection.create(childOutput :+ attr, childOutput :+ attr)
          val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
          val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
          heaps.valuesIterator.flatMap { h =>
            val arr = h.iterator.asScala.toArray
            java.util.Arrays.sort(arr, ord)
            arr.iterator.zipWithIndex.map { case (row, i) =>
              rankRow.setInt(0, i + 1)
              outProj(joined(row, rankRow))
            }
          }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Public API. */
object TopK {

  /** Sort key: column name + direction. */
  final case class Sort(name: String, desc: Boolean = false)
  def asc(name: String): Sort = Sort(name)
  def desc(name: String): Sort = Sort(name, desc = true)

  /** Top-k rows per key (row_number-over-window semantics with the same
    * total order — include a tiebreak column for determinism).
    *
    * Column names (not Column objects) on purpose: catalyst SortOrder is
    * built directly, keeping the ColumnNode layer (non-serializable in
    * Spark 4) out of the physical plan's closures. */
  def perKey(df: DataFrame, keys: Seq[String], order: Seq[Sort], k: Int): DataFrame = {
    require(k >= 1, s"top-k needs k >= 1, got $k") // PriorityQueue rejects capacity < 1
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy
    }
    val sortOrder = order.map { s =>
      SortOrder(UnresolvedAttribute.quoted(s.name), if (s.desc) Descending else Ascending)
    }
    val plan = TopKPerKeyPlan(
      keys.map(UnresolvedAttribute.quoted),
      sortOrder, k,
      Bridge.logicalPlan(df))
    Bridge.ofRows(spark, plan)
  }
}
