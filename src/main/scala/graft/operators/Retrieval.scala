package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-list fusion for hybrid (sparse + dense) retrieval.
  *
  * Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR 2009): each
  * system contributes 1/(k0 + rank) for the documents it ranked;
  * documents missing from a list contribute 0 from that list. RRF is
  * the standard score-free fusion — it needs no calibration between
  * BM25 scores and cosine similarities, only the ranks.
  *
  * Scale design (100 TB): fusion consumes the two TOP-K LISTS, not the
  * corpus — the full-outer join touches ≤ 2k rows regardless of corpus
  * size, so the expensive parts remain the per-system retrievals
  * (BM25: one map-combinable corpus aggregate + TakeOrdered; dense:
  * brute top-k or any of the ANN families), each already scale-shaped.
  * The rank window orders ≤ topK rows after a TakeOrdered, never the
  * corpus.
  *
  * Value-exactness: 1/(k0 + rank) is one IEEE double division and the
  * two-term sum has a fixed operand order (a-list + b-list), so a SQL
  * oracle reproduces the doubles bitwise.
  */
object Retrieval {

  /** Fuse two ranked lists — `a` carries (idCol, aRankCol), `b`
    * carries (idCol, bRankCol), ranks 1-based — into the fused top
    * `topK`: (idCol, aRankCol, bRankCol, rrf, rank), per-system ranks
    * NULL where a document appears in only one list, ties broken by
    * id ascending. */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String,
              aRankCol: String, bRankCol: String,
              k0: Int = 60, topK: Int = 20): DataFrame = {
    def contrib(c: String) = // null rank → null division → 0 contribution
      coalesce(lit(1.0) / (lit(k0.toDouble) + col(c).cast("double")), lit(0.0))
    val fused = a.join(b, Seq(idCol), "full_outer")
      .select(col(idCol), col(aRankCol), col(bRankCol),
        (contrib(aRankCol) + contrib(bRankCol)).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(topK)
    // the unpartitioned window sees topK rows, not the corpus
    fused.withColumn("rank",
      row_number().over(Window.orderBy(col("rrf").desc, col(idCol)))
        .cast("long"))
  }
}
