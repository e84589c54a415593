package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Bounded min-k as a DECLARATIVE aggregate over k FLAT long buffer
  * slots — the k smallest longs seen, kept sorted ascending.
  *
  * Why this shape: a udaf (`Aggregator`) is a TypedImperativeAggregate —
  * every row round-trips through an ExpressionEncoder into JVM objects
  * and the aggregate runs as interpreted ObjectHashAggregate. An
  * array-buffered DeclarativeAggregate is no better: a non-primitive
  * buffer also falls back to ObjectHashAggregate (measured 5.5 s vs the
  * 1.3 s builtin-`min` floor on a 15M-pair k-NN). With k PRIMITIVE
  * LongType slots the buffer lives in the UnsafeRow of a plain
  * HashAggregate and the per-row update — an insertion sorting network
  * `n₁ = min(m₁,v); nᵢ = min(max(mᵢ₋₁,v), mᵢ)` — compiles into
  * whole-stage codegen (measured at the builtin-`min` floor).
  *
  * Callers encode (ordering, tie) into one long — e.g. `d2 << 33 | id`
  * — exact iff both fields fit their bits; the [[graft.operators.TopK]]
  * wrappers own that packing contract. Ordering by one machine word and
  * decoding after the reduction is the standard vectorized top-k trick.
  *
  * Distributive: merge takes the k smallest of the two buffers'
  * concatenation (one array sort per merge — merges are rare, one per
  * group per mapper), so map-side combine applies and the shuffle
  * carries ≤ k longs per (mapper, group), never the pair space.
  *
  * Contract: `Long.MaxValue` is the empty-slot sentinel — a genuine
  * input of MaxValue is dropped from the result (packed encodings never
  * produce it). NULL inputs are ignored. `k` is capped so the merge
  * network stays small.
  */
case class MinKLongs(child: Expression, k: Int)
    extends DeclarativeAggregate with UnaryLike[Expression] {
  require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")

  private val Empty = Long.MaxValue

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a LONG input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "min_k_longs"

  private lazy val slots: Seq[AttributeReference] = (1 to k).map(i =>
    AttributeReference(s"m$i", LongType, nullable = false)())

  override lazy val aggBufferAttributes: Seq[AttributeReference] = slots

  override lazy val initialValues: Seq[Expression] =
    Seq.fill(k)(Literal(Empty))

  // insertion network: with the buffer sorted ascending, inserting v
  // and trimming to k is n₁ = min(m₁,v), nᵢ = min(max(mᵢ₋₁,v), mᵢ) —
  // rows past the cutoff (v ≥ mₖ) leave every slot unchanged, so the
  // hot path is k codegen'd min/max ops on registers, no allocation
  override lazy val updateExpressions: Seq[Expression] = {
    val v = If(IsNull(child), Literal(Empty), child)
    slots.zipWithIndex.map { case (m, i) =>
      if (i == 0) Least(Seq(m, v))
      else Least(Seq(Greatest(Seq(slots(i - 1), v)), m))
    }
  }

  // merge: k smallest of the 2k concatenated slots via one array sort;
  // each output slot re-states the sort (no cross-slot CSE in codegen)
  // but merges run once per (group, mapper), not per row
  override lazy val mergeExpressions: Seq[Expression] = {
    val all = CreateArray(slots.map(_.left) ++ slots.map(_.right))
    val sorted = new SortArray(all)
    (1 to k).map(i => ElementAt(sorted, Literal(i)))
  }

  override lazy val evaluateExpression: Expression =
    ArrayRemove(CreateArray(slots), Literal(Empty))

  override protected def withNewChildInternal(newChild: Expression): MinKLongs =
    copy(child = newChild)
}
