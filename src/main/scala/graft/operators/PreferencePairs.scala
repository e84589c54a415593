package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Margin-based preference-pair mining — the reward-model / DPO
  * data-construction step when supervision is POINTWISE quality
  * scores (a trained classifier, human ratings): inside each
  * (stratum, shard) the i-th best example is matched with the i-th
  * worst, and a pair survives when the score gap clears the margin.
  *
  * Why rank-symmetric matching: it is ONE deterministic pass — each
  * example lands in at most one pair (no quadratic pair space, no
  * rejection sampling), the strongest-contrast pairs come out first
  * (pair_rank 1 matches the stratum's best against its worst), and
  * the margin check is a per-pair predicate instead of a search.
  * Reference scope: none (beyond-reference LLM-pipeline operator) —
  * the construction is the standard pairwise-from-pointwise
  * reduction used to train reward models from scored corpora.
  *
  * Scale shape (100 TB): shards are md5 hash buckets over the id, so
  * every window partition holds corpus/(|strata|·nShards) rows — the
  * q118/q119 no-corpus-window discipline, with nShards the scale
  * knob; the best↔worst match is a (stratum, shard, i) EQUI-join of
  * two projections of one ranked relation (both sides already hash-
  * partitioned by the window). Scores must arrive as integer-grid
  * longs, so gaps are exact integer arithmetic on any engine.
  */
object PreferencePairs {

  /** @param scored  input relation; one row per example
    * @param idCol   unique example id (long) — rank tie-break and
    *                shard hash input
    * @param stratumCol pairing stratum (e.g. source/domain)
    * @param scoreCol   quality score on an integer grid (long)
    * @param nShards    hash-shard count per stratum (window bound)
    * @param marginQ    minimum score gap, in grid units (inclusive)
    * @return (stratum, shard, pair_rank, chosen_id, rejected_id,
    *         gap_q) — pair_rank 1..floor(n/2) before the margin cut */
  def mine(scored: DataFrame, idCol: String, stratumCol: String,
           scoreCol: String, nShards: Int, marginQ: Long): DataFrame = {
    val base = scored.select(col(stratumCol).as("stratum"),
      col(idCol).as("_id"), col(scoreCol).cast("long").as("_q"),
      pmod(conv(substring(md5(concat(lit("pp|"),
        col(idCol).cast("string"))), 1, 8), 16, 10).cast("long"),
        lit(nShards.toLong)).as("shard"))
    val w = Window.partitionBy(col("stratum"), col("shard"))
    val ranked = base
      .withColumn("rb", row_number()
        .over(w.orderBy(col("_q").desc, col("_id"))).cast("long"))
      .withColumn("n", count(lit(1)).over(w))
    val best = ranked.select(col("stratum"), col("shard"),
      col("rb").as("i"), col("_id").as("chosen_id"),
      col("_q").as("_qc"), col("n"))
    val worst = ranked.select(col("stratum"), col("shard"),
      (col("n") - col("rb") + 1L).as("i"),
      col("_id").as("rejected_id"), col("_q").as("_qr"))
    // i < n+1-i on every kept pair, so chosen_id ≠ rejected_id by
    // construction (the odd-n middle row would self-pair — excluded)
    best.join(worst, Seq("stratum", "shard", "i"))
      .filter(col("i") * 2 <= col("n") &&
        col("_qc") - col("_qr") >= marginQ)
      .select(col("stratum"), col("shard"), col("i").as("pair_rank"),
        col("chosen_id"), col("rejected_id"),
        (col("_qc") - col("_qr")).as("gap_q"))
  }
}
