package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-key top-k as a bounded AGGREGATE instead of a window.
  *
  * The window form (`row_number().over(partitionBy(key).orderBy(ord))
  * .filter(rank <= k)`) shuffles EVERY row to its key's partition and
  * sorts the whole table before discarding all but k rows per key. This
  * operator keeps at most k rows per key inside each mapper's partial
  * aggregation buffer, so the shuffle carries ≤ k·mappers rows per key
  * and there is no full sort anywhere — the plan is a partial/final
  * ObjectHashAggregate pair, the same shape as a map-side-combined sum.
  * At 100 TB with k=3 this is the difference between shuffling the
  * table and shuffling a few rows per key per mapper.
  *
  * Ordering: `ord` descending, ties broken by `tie` ascending — the
  * exact semantics of the q41 window form, which shares its oracle. */
object TopK {

  case class Entry(ord: Double, tie: Long)

  private class TopKAgg(k: Int) extends Aggregator[Entry, Seq[Entry], Seq[Entry]] {
    // buffer invariant: always sorted by (-ord, tie), size ≤ k — so the
    // per-row hot path is one comparison against the cutoff (the last
    // element) and almost every row is rejected without allocating
    private def better(a: Entry, b: Entry): Boolean =
      a.ord > b.ord || (a.ord == b.ord && a.tie < b.tie)
    private def insert(s: Seq[Entry], a: Entry): Seq[Entry] = {
      val (hi, lo) = s.span(better(_, a))
      (hi :+ a) ++ lo
    }
    private def trim(s: Seq[Entry]): Seq[Entry] =
      s.sortBy(e => (-e.ord, e.tie)).take(k)
    override def zero: Seq[Entry] = Nil
    override def reduce(b: Seq[Entry], a: Entry): Seq[Entry] =
      if (b.size < k) insert(b, a)
      else if (better(a, b.last)) insert(b.dropRight(1), a)
      else b
    override def merge(a: Seq[Entry], b: Seq[Entry]): Seq[Entry] = trim(a ++ b)
    override def finish(b: Seq[Entry]): Seq[Entry] = b
    override def bufferEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
    override def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  }

  /** The aggregate column: `topK(3)(col(ord), col(tie))` — the udaf's
    * product input encoder flattens Entry into two arguments. */
  def topK(k: Int): (Column, Column) => Column = {
    val u = udaf(new TopKAgg(k), Encoders.product[Entry])
    (ord: Column, tie: Column) => u(ord, tie)
  }

  /** Codegen-native bounded min-k over PACKED longs (see
    * [[graft.functions.MinKLongs]]): returns the k smallest values of
    * `packed` per group as a sorted array<long>. The caller packs
    * (ordering, tie) into one long and owns the field widths — exact
    * iff both fields fit their bits. Prefer this over [[topK]] on hot
    * paths: the update is pure expressions inside whole-stage codegen,
    * no per-row object encoding. */
  def minKPacked(k: Int)(packed: Column): Column = {
    import org.apache.spark.sql.GraftExpressionBridge._
    column(graft.functions.MinKLongs(expression(packed), k)
      .toAggregateExpression())
  }

  /** df grouped by `key`, keeping the top `k` rows by `ord` desc (ties:
    * `tie` asc). Output: (key, ord, tie, rank 1..k) — the window-form
    * columns, so the two plans can share one oracle. */
  def perKeyDesc(df: DataFrame, key: String, ord: String, tie: String,
                 k: Int): DataFrame =
    df.groupBy(col(key))
      .agg(topK(k)(col(ord), col(tie)).as("top"))
      .select(col(key), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col(key), col("e.ord").as(ord), col("e.tie").as(tie),
        (col("pos") + 1).cast("long").as("rank"))
}
