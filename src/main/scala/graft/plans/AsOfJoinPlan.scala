package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator form of the backward as-of join (SURVEY preference
  * ladder (c): custom LogicalPlan + SparkStrategy + SparkPlan, injected
  * via [[graft.GraftExtensions]]).
  *
  * Semantics match [[graft.operators.AsOfJoin.backward]]: each left row
  * is decorated with `rightPayload` from the LATEST right row of the
  * same key group whose time is `<= ` the left row's time (inclusive,
  * like DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`), or nulls when no
  * right row precedes it.
  *
  * Why a physical operator when the union+window composition already
  * does one shuffle: the composed form materializes left∪right rows
  * padded with nulls (every row carries both sides' payload columns
  * through the shuffle and sort) and runs a window carry-forward over
  * the union. This node shuffles each side with ONLY its own columns,
  * sorts each side independently (EnsureRequirements inserts the
  * exchanges and sorts from the declared requirements — nothing is
  * hand-scheduled), and then streams a single forward merge per
  * partition: O(1) state (one buffered candidate row), no padded union,
  * no window buffering.
  *
  * Scale: distribution requirement is `ClusteredDistribution` on the
  * key columns for both children, so the planner co-partitions the
  * sides exactly like a shuffled join — skew in the key column behaves
  * like any SMJ (AQE's split does not apply to custom nodes; salt the
  * key upstream if one key dominates). The merge never rewinds the
  * right iterator, so arbitrarily long right groups stream through
  * without buffering.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    rightPayload: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]; a no-op for every other
  * node, as planner strategies compose. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, payload) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, payload) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    rightPayload: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  /** Both sides clustered on their key columns — EnsureRequirements
    * inserts compatible hash exchanges (and re-uses an existing
    * partitioning when a side already satisfies it). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** Each side sorted by (keys…, time) within its partitions; the merge
    * below relies on both iterators being key-then-time ordered. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val payload = rightPayload
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // per-partition, so codegen'd projections/orderings are task-local
      val lKeyProj = UnsafeProjection.create(leftKeys, leftOut)
      val rKeyProj = UnsafeProjection.create(rightKeys, rightOut)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), leftOut)
      val rTimeProj = UnsafeProjection.create(Seq(rightTime), rightOut)
      val payloadProj = UnsafeProjection.create(payload, rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullPayload = new GenericInternalRow(payload.size) // all null
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // head of the right iterator not yet consumed into the candidate
        private var rHead: InternalRow = _
        // latest right row with time <= current left time, and its key
        // (projection buffers are reused, so both are copies)
        private var candidate: InternalRow = _
        private var candidateKey: InternalRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          val lTime = lTimeProj(lRow)
          var advance = true
          while (advance) {
            if (rHead == null && rIter.hasNext) rHead = rIter.next()
            if (rHead == null) advance = false
            else {
              val cmp = keyOrd.compare(rKeyProj(rHead), lKey)
              if (cmp < 0) {
                rHead = null // right key already behind every future left row
              } else if (cmp == 0 &&
                         timeOrd.compare(rTimeProj(rHead), lTime) <= 0) {
                candidate = rHead.copy()
                candidateKey = rKeyProj(rHead).copy()
                rHead = null
              } else {
                advance = false // right is ahead; stop for this left row
              }
            }
          }
          val matched =
            candidate != null && keyOrd.compare(candidateKey, lKey) == 0
          resultProj(joined(
            lRow, if (matched) payloadProj(candidate) else nullPayload))
        }
      }
    }
  }
}
