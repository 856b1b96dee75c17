package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The as-of join as a FIRST-CLASS operator: custom `LogicalPlan` node +
  * planner `SparkStrategy` + physical `SparkPlan`, registered through
  * `SparkSessionExtensions` — the (c) tier of the extension ladder
  * (compose > custom Expression > custom operator), used here because
  * the operator's ideal physical form is a streaming two-iterator merge
  * scan that no composition of built-ins expresses without either a
  * union materialization ([[graft.ops.TemporalJoins.asofJoin]]'s
  * window formulation — the semantics oracle this operator is pinned
  * against) or an inequality join.
  *
  * Physical contract: both children cluster-distributed on the key and
  * sorted by (key, time) — EnsureRequirements plans exactly one
  * Exchange+Sort per side, after which each co-partition pair is merged
  * in a single O(|L|+|R|) forward pass holding ONE buffered right row
  * and ONE retained payload; memory is O(1) per partition regardless of
  * group sizes (the window formulation's sort buffers are per-partition
  * too, but it unions both inputs into one sorted stream first).
  * Semantics match [[graft.ops.TemporalJoins.asofJoin]] exactly: latest
  * right row with rightTime <= leftTime per key (inclusive), null
  * payload when none, left-outer.
  */
case class AsofMergeJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    payload: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofMergeJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsofMergeJoinStrategy extends SparkStrategy {
  def inject(e: SparkSessionExtensions): Unit =
    e.injectPlannerStrategy(_ => AsofMergeJoinStrategy)

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofMergeJoinNode(l, r, lk, rk, lt, rt, pay) =>
      AsofMergeJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, pay) :: Nil
    case _ => Nil
  }
}

case class AsofMergeJoinExec(left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    payload: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lT = leftTime
    val rT = rightTime
    val pay = payload
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTProj = UnsafeProjection.create(Seq(lT), lOut)
      val rTProj = UnsafeProjection.create(Seq(rT), rOut)
      val payProj = UnsafeProjection.create(pay.asInstanceOf[Seq[Expression]], rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val nullPay = new GenericInternalRow(pay.length)
      val joined = new JoinedRow
      // downstream operators consume UnsafeRows — flatten the JoinedRow.
      // The payload half of the input schema must be NULLABLE even when
      // the right attrs are not: unmatched left rows carry a null row,
      // and a non-nullable BoundReference would skip the null check and
      // read zeros instead of nulls
      val resultProj = UnsafeProjection.create(
        output.asInstanceOf[Seq[Expression]],
        lOut ++ pay.map(_.withNullability(true)))

      new Iterator[InternalRow] {
        private var rRow: InternalRow = _
        private var rKey: InternalRow = _
        private var rTime: InternalRow = _
        advanceRight()
        // last right row whose key matched some left key, retained as
        // (key copy, payload copy) — O(1) state for the whole partition
        private var lastKey: InternalRow = _
        private var lastPay: InternalRow = _

        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rRow = rIter.next()
            rKey = rKeyProj(rRow).copy()
            rTime = rTProj(rRow).copy()
          } else rRow = null

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          val lt = lTProj(l)
          // consume every right row at or before (lk, lt) in merge
          // order; the latest same-key one becomes the retained match
          var cmp = if (rRow == null) 1 else keyOrd.compare(rKey, lk)
          while (rRow != null &&
              (cmp < 0 || (cmp == 0 && tOrd.compare(rTime, lt) <= 0))) {
            if (cmp == 0) { lastKey = rKey; lastPay = payProj(rRow).copy() }
            advanceRight()
            cmp = if (rRow == null) 1 else keyOrd.compare(rKey, lk)
          }
          val p = if (lastKey != null && keyOrd.compare(lastKey, lk) == 0)
            lastPay else nullPay
          resultProj(joined(l, p))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofMergeJoinExec =
    copy(left = newLeft, right = newRight)
}
