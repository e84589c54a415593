package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the train/test-overlap check every
  * training-data pipeline runs before a corpus ships: find training
  * documents that share enough word-n-gram shingles with a held-out
  * benchmark document to contaminate evaluation.
  *
  * Scale design (100 TB train corpus vs a tiny benchmark set):
  *  - the benchmark side (docs AND its shingle rows) is broadcast — the
  *    train corpus is scanned once, never shuffled on document identity;
  *  - candidates come from the shingle equi-join (only train docs that
  *    actually share a shingle reach the aggregate), and the per-pair
  *    intersection count is map-side combinable;
  *  - overlap = |shared shingles| / |benchmark shingles| is exact
  *    integer counting + one double division, so the whole check is
  *    value-reproducible in any engine.
  */
object Decontaminate {

  /** Per-pair overlap: (train_id, bench_id, n_shared, overlap) for every
    * train/bench pair sharing ≥ 1 shingle and overlap ≥ `minOverlap`. */
  def overlapPairs(train: DataFrame, bench: DataFrame, idCol: String,
                   textCol: String, shingleN: Int,
                   minOverlap: Double): DataFrame = {
    val tsh = Dedup.shingleRows(train, idCol, textCol, shingleN)
      .select(col("doc_id").as("train_id"), col("shingle"))
    val bsh = Dedup.shingleRows(bench, idCol, textCol, shingleN)
      .select(col("doc_id").as("bench_id"), col("shingle"))
    val bCounts = bsh.groupBy(col("bench_id"))
      .agg(count(lit(1)).as("n_bench_sh"))
    // shingleRows is per-doc distinct, so the join row count per pair IS
    // the intersection size
    tsh.join(broadcast(bsh), Seq("shingle"))
      .groupBy(col("train_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(bCounts), Seq("bench_id"))
      .select(col("train_id"), col("bench_id"), col("n_shared"),
        (col("n_shared").cast("double") / col("n_bench_sh").cast("double"))
          .as("overlap"))
      .filter(col("overlap") >= minOverlap)
  }

  /** Per-benchmark-doc contamination report: how many train docs share
    * any shingle, the worst overlap, and how many cross the
    * `contaminatedAt` line. Benchmark docs with no overlapping train doc
    * report 0 candidates. Output: (bench_id, n_bench_sh, n_candidates,
    * max_overlap, n_contaminated). */
  def report(train: DataFrame, bench: DataFrame, idCol: String,
             textCol: String, shingleN: Int,
             contaminatedAt: Double): DataFrame = {
    val pairs = overlapPairs(train, bench, idCol, textCol, shingleN,
      minOverlap = 0.0)
    val perBench = pairs.groupBy(col("bench_id"))
      .agg(count(lit(1)).as("n_candidates"),
           max(col("overlap")).as("max_overlap"),
           sum(when(col("overlap") >= contaminatedAt, 1L).otherwise(0L))
             .as("n_contaminated"))
    val bCounts = Dedup.shingleRows(bench, idCol, textCol, shingleN)
      .groupBy(col("doc_id").as("bench_id"))
      .agg(count(lit(1)).as("n_bench_sh"))
    bCounts.join(perBench, Seq("bench_id"), "left")
      .select(col("bench_id"), col("n_bench_sh"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("max_overlap"), lit(0.0)).as("max_overlap"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
  }

  /** SEMANTIC decontamination: train docs whose EMBEDDING is
    * near-cosine-identical to a benchmark doc's — catches paraphrases
    * and translations that share no n-gram (the gap [[overlapPairs]]
    * can't see). Same LSH shape as [[Dedup.embeddingNearDup]] but
    * across two tables: both sides bucket by the shared hyperplane
    * family (map-only), candidates come from the bucket equi-join with
    * the (tiny) benchmark side broadcast, exact cosine verifies. The
    * train corpus is scanned once and never shuffled; recall is the
    * usual LSH trade (pairs straddling a plane are missed — raise
    * nPlanes bands or probe flipped buckets to tighten).
    * Inputs: (id, embedding) both sides.
    * Output: (train_id, bench_id, bucket, sim ≥ threshold). */
  def semantic(train: DataFrame, bench: DataFrame, threshold: Double,
               nPlanes: Int, dim: Int): DataFrame =
    semanticImpl(train, bench, threshold, nPlanes, dim, probeFlips = false)

  /** [[semantic]] with Hamming-1 multiprobe on the bench side: each
    * benchmark vector probes its own bucket plus every 1-bit flip
    * (nPlanes+1 keys — the bench side is tiny, so the probe explode is
    * free), recovering every pair whose buckets differ by one plane.
    * A pair at bucket distance d ≤ 1 collides on exactly one probe key
    * (identity for d=0, the flipped plane for d=1), so the equi-join
    * emits each pair once — still no pair space, still one corpus
    * scan. The remaining misses straddle ≥ 2 planes at once
    * (q121 measures the difference instead of guessing). */
  def semanticProbed(train: DataFrame, bench: DataFrame, threshold: Double,
                     nPlanes: Int, dim: Int): DataFrame =
    semanticImpl(train, bench, threshold, nPlanes, dim, probeFlips = true)

  private def semanticImpl(train: DataFrame, bench: DataFrame,
                           threshold: Double, nPlanes: Int, dim: Int,
                           probeFlips: Boolean): DataFrame = {
    import graft.functions.VectorFunctions._
    val t = train.select(
      hyperplaneBucket(col("embedding"), nPlanes, dim).as("bucket"),
      col("id").as("train_id"), col("embedding").as("train_emb"),
      norm(col("embedding")).as("train_nrm"))
    val b0 = bench.select(
      hyperplaneBucket(col("embedding"), nPlanes, dim).as("own_bucket"),
      col("id").as("bench_id"), col("embedding").as("bench_emb"),
      norm(col("embedding")).as("bench_nrm"))
    val b =
      if (!probeFlips) b0.withColumn("bucket", col("own_bucket"))
      else b0.select(col("bench_id"), col("bench_emb"), col("bench_nrm"),
        explode(array(
          (0 until nPlanes).map(j =>
            col("own_bucket").bitwiseXOR(lit(1L << j))) :+ col("own_bucket")
            : _*)).as("bucket"))
    // NO train_id =!= bench_id guard: the two sides are independent
    // tables with unrelated id spaces — an id collision between a
    // training doc and a benchmark item is NOT a self-pair, and
    // dropping it would ship a contaminated doc unreported. (Same-table
    // callers split disjointly, as q117/q120/q121 do.)
    t.join(broadcast(b.select(col("bucket"), col("bench_id"),
        col("bench_emb"), col("bench_nrm"))), Seq("bucket"))
      .select(col("train_id"), col("bench_id"), col("bucket"),
        (when(col("train_nrm") * col("bench_nrm") === 0.0, lit(0.0))
          .otherwise(dot(col("train_emb"), col("bench_emb"))
            / (col("train_nrm") * col("bench_nrm")))).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
