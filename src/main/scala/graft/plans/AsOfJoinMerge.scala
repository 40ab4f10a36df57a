package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.Bridge

/** Custom whole-operator: sorted-merge as-of join.
  *
  * For each left row, attach the matching right row of the same key:
  * backward = most recent right with `rightTime <= leftTime` (ties on
  * equal right time → the greatest tiebreak); forward = earliest right
  * with `rightTime >= leftTime` (same tie policy). The union +
  * last-non-null-window formulation (see operators.AsOfJoin) is one
  * shuffle but ships every row null-padded to the unified schema — double
  * wire width — and pays a window sort over the union. This operator
  * shuffles each side at its own width, sorts each side independently
  * (EnsureRequirements inserts the exchanges and sorts), then streams
  * both sorted partitions through a single merge pass: O(n log n) in the
  * sort, O(n) merge, no per-key window buffers.
  *
  * Engine analog: `dlyfix.getcorrection` (scripts/dlyfix.py:128) matching
  * each observation to the config valid at its MJD.
  */
final case class AsOfJoinPlan(
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightCarry: Seq[Expression],   // carried right columns (incl. time first)
    tiebreak: Option[Expression],
    carryAttrs: Seq[Attribute],    // output attributes for the carried cols
    forward: Boolean,
    left: LogicalPlan,
    right: LogicalPlan,
) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ carryAttrs
  // carryAttrs are minted by this operator (renamed/nullable right cols),
  // not passed through from children
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(carryAttrs)
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoinPlan =
    copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(lk, rk, lt, rt, carry, tb, attrs, fwd, l, r) =>
      AsOfJoinMergeExec(lk, rk, lt, rt, carry, tb, attrs, fwd, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinMergeExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightCarry: Seq[Expression],
    tiebreak: Option[Expression],
    carryAttrs: Seq[Attribute],
    forward: Boolean,
    left: SparkPlan,
    right: SparkPlan,
) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ carryAttrs

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(carryAttrs)

  override def requiredChildDistribution =
    org.apache.spark.sql.catalyst.plans.physical.ClusteredDistribution(Seq(leftKey)) ::
    org.apache.spark.sql.catalyst.plans.physical.ClusteredDistribution(Seq(rightKey)) :: Nil

  /** Both sides sorted by (key, time[, tiebreak]) — EnsureRequirements
    * inserts the SortExecs; the merge below is then a single pass. The
    * tiebreak flips to DESCENDING in forward mode so the FIRST row of an
    * equal-time run is the max-tiebreak row (the merge peeks at the run
    * head without consuming it). */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      tiebreak.map(t => SortOrder(t, if (forward) Descending else Ascending)),
  )

  override def outputPartitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKey
    val rk = rightKey
    val lt = leftTime
    val rt = rightTime
    val carry = rightCarry
    val keyType = lk.dataType
    val timeType = lt.dataType
    val nCarry = carryAttrs.size
    val fwd = forward

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(lk), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rk), rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      val carryProj = UnsafeProjection.create(carry, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(keyType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val nullCarry = new GenericInternalRow(nCarry)
      val joined = new JoinedRow
      // downstream operators (exchanges, aggregates) expect UnsafeRows
      val resultProj = UnsafeProjection.create(lOut ++ carryAttrs, lOut ++ carryAttrs)

      val rBuf = rIter.buffered
      // backward state: the best (latest) right row seen for the current key
      var matchedCarry: InternalRow = null
      var matchedKey: InternalRow = null

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTimeRow = lTimeProj(lRow)
        // null-time left rows match nothing in either direction (a null
        // compares below every time, which would spuriously satisfy the
        // forward bound for the whole key run)
        if (lTimeRow.isNullAt(0)) {
          resultProj(joined(lRow, nullCarry))
        } else if (!fwd) {
          val lTime = lTimeRow.copy()
          // advance right while its key is before the left key, or same key
          // with time <= left time; remember the last same-key advance
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rKey = rKeyProj(rBuf.head)
            val kc = keyOrd.compare(rKey, lKey)
            if (kc < 0) {
              rBuf.next() // right key fully behind: discard
            } else if (kc == 0 && timeOrd.compare(rTimeProj(rBuf.head), lTime) <= 0) {
              val r = rBuf.next()
              matchedCarry = carryProj(r).copy()
              matchedKey = lKey.copy()
            } else {
              advancing = false
            }
          }
          val ok = matchedCarry != null && matchedKey != null &&
            keyOrd.compare(matchedKey, lKey) == 0
          resultProj(joined(lRow, if (ok) matchedCarry else nullCarry))
        } else {
          // no .copy(): lTimeRow is only read within this iteration and
          // rTimeProj has its own buffer
          val lTime = lTimeRow
          // discard right rows that can never match this or any later left
          // row (left times ascend within a key): key fully behind, or
          // same key with time strictly before the left time
          var advancing = true
          var headSameKey = false
          while (advancing && rBuf.hasNext) {
            val rKey = rKeyProj(rBuf.head)
            val kc = keyOrd.compare(rKey, lKey)
            if (kc < 0 || (kc == 0 && timeOrd.compare(rTimeProj(rBuf.head), lTime) < 0)) {
              rBuf.next()
            } else {
              // remember the head comparison instead of re-projecting it
              advancing = false
              headSameKey = kc == 0
            }
          }
          // the head (if same key) is the earliest right at-or-after the
          // left time — PEEK, don't consume: later left rows may match it
          resultProj(joined(lRow, if (headSameKey) carryProj(rBuf.head) else nullCarry))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfJoinMergeExec =
    copy(left = l, right = r)
}

/** Column-API entry mirroring operators.AsOfJoin.join's contract. */
object AsOfMerge {

  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
  }

  /** Sorted-merge as-of join: left columns + `asof_time` (the matched
    * right time; null when unmatched) + the carried `rightCols`.
    * `direction`: "backward" (default) or "forward" ("nearest" lives on
    * the window form, operators.AsOfJoin). */
  def join(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      rightTiebreak: Option[String] = None,
      direction: String = "backward",
  ): DataFrame = {
    require(Set("backward", "forward")(direction),
      s"direction must be backward|forward, got '$direction' (nearest: use operators.AsOfJoin)")
    val spark = left.sparkSession
    install(spark)
    val lPlan = Bridge.logicalPlan(left)
    // null-key rows can't join and null-time rows can never satisfy
    // either direction's bound; drop them so the natural-ordering merge
    // never compares against nulls (operators.AsOfJoin filters identically)
    val rPlan = Bridge.logicalPlan(
      right.filter(right(rightKey).isNotNull && right(rightTime).isNotNull))
    def rAttr(name: String): Attribute =
      rPlan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"right column $name not found"))
    def lAttr(name: String): Attribute =
      lPlan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"left column $name not found"))
    // The merge builds key/time orderings from the left side's types and
    // applies them to right rows — mixed types (e.g. TIMESTAMP_NTZ vs
    // TIMESTAMP, or decimals across the compact/bytes layout boundary)
    // would compare garbage silently; fail loudly instead. sameType
    // ignores only nullability, which has no layout impact.
    def compat(a: org.apache.spark.sql.types.DataType, b: org.apache.spark.sql.types.DataType) =
      org.apache.spark.sql.types.DataType.equalsStructurally(a, b, ignoreNullability = true)
    require(compat(lAttr(leftKey).dataType, rAttr(rightKey).dataType),
      s"as-of key types differ: ${lAttr(leftKey).dataType} vs ${rAttr(rightKey).dataType}")
    require(compat(lAttr(leftTime).dataType, rAttr(rightTime).dataType),
      s"as-of time types differ: ${lAttr(leftTime).dataType} vs ${rAttr(rightTime).dataType} " +
        "(cast explicitly, e.g. parquet-naive timestamps arrive as TIMESTAMP_NTZ)")
    val carryExprs = rAttr(rightTime) +: rightCols.map(rAttr)
    // fresh output attributes: same types, nullable (unmatched → null)
    val carryAttrs = ("asof_time" +: rightCols).zip(carryExprs).map { case (n, e) =>
      org.apache.spark.sql.catalyst.expressions.AttributeReference(n, e.dataType, nullable = true)()
    }
    val plan = AsOfJoinPlan(
      lAttr(leftKey), rAttr(rightKey), lAttr(leftTime), rAttr(rightTime),
      carryExprs, rightTiebreak.map(rAttr), carryAttrs, direction == "forward", lPlan, rPlan)
    Bridge.ofRows(spark, plan)
  }
}
