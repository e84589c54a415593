package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Center BOTH sides with the TRAIN corpus's exact-grid mean — the
    * frozen-quantizer discipline ([[Dedup.centerWith]]): the corpus is
    * what an index would have been built over, so its mean is the one
    * frozen at build time, and benchmark vectors are centered with
    * that same mean at query time so bucket codes stay comparable.
    * Centering is what makes the cosine verdict MEANINGFUL on raw
    * all-positive embedding spaces: uncentered, the median background
    * pairwise cosine here is ~0.94 and "contaminated at ≥ 0.3" is a
    * bucket-coincidence test, not a semantic one (VERDICT r6). */
  def centered(train: DataFrame, bench: DataFrame,
               dim: Int): (DataFrame, DataFrame) = {
    // NOT localCheckpoint'd: a checkpointed 1-row agg becomes a
    // 0/1-partition ExistingRDD that BroadcastExchange refuses to
    // build (observed "Not enough memory to build and broadcast" on a
    // 65-column single row). The agg re-runs once per side — one extra
    // train scan, the price of keeping both broadcasts plan-built.
    val sums = Dedup.quantizedSums(train, dim)
    (Dedup.centerWith(train, sums, dim), Dedup.centerWith(bench, sums, dim))
  }

  /** OR-of-bands semantic decontamination over CENTERED embeddings —
    * the production entry point. AND-bucketing (even with Hamming-1
    * probes) cannot hold recall on weakly-similar contamination pairs:
    * at cosine θ just above the 0.3 line, P(plane agrees) ≈ 0.6, so an
    * 8-plane code catches p⁸+8p⁷(1−p) ≈ 0.17 of them (measured 0.165
    * on this corpus — q121). Banding flips the combinator: `bands`
    * independent tables of `planesPerBand` sign bits each, a pair is a
    * candidate if ANY band's code matches — recall 1−(1−p^k)^L ≈ 0.93
    * at L=16, k=4 (measured, q121), and the gate hardens exponentially
    * in k for the near-orthogonal background (p ≈ 0.5 ⇒ per-band 2⁻ᵏ).
    * At 100 TB, k is the gating knob (k ≈ 12-16, L sized to the recall
    * target) — here k=4 keeps the oracle's θ-join cheap.
    *
    * Plan shape: the benchmark side is broadcast, the train corpus is
    * scanned ONCE with its L band keys generated map-side (explode
    * before a broadcast join is map-side row generation, not a
    * shuffle), and the zip_with earliest-band filter makes each pair
    * verify exactly once — zero shuffles end to end.
    * Output: (train_id, bench_id, band = first colliding, sim ≥
    * threshold). */
  def semanticBanded(train: DataFrame, bench: DataFrame, threshold: Double,
                     bands: Int, planesPerBand: Int, dim: Int): DataFrame = {
    val (t0, b0) = centered(train, bench, dim)
    // materialization point 1 of 2, load-bearing (measured 198 s →
    // ~2 s at sf0.1 without it): the CENTERED arrays — bandKeys is an
    // interpreted higher-order fold that references its input once per
    // plane, so an unmaterialized centering expression (64 arithmetic
    // exprs over the raw floats + the broadcast mean row) would be
    // re-derived L·k times per row inside the lambda.
    val tCen = t0.localCheckpoint(eager = true)
    val bCen = b0.localCheckpoint(eager = true)
    semanticBandedOn(tCen, bCen, threshold, bands, planesPerBand, dim)
  }

  /** [[semanticBanded]] over sides that are ALREADY centered and
    * already materialized (localCheckpoint'd) — exposed so a caller
    * running SEVERAL band configurations over one corpus (q151's
    * recall measurement runs two, plus the exact pass) centers once
    * instead of once per configuration: each [[centered]] call costs a
    * fresh train-mean aggregate per side plus two checkpoints
    * (guide §1.2 step 1 — don't compute things twice). Values are
    * unchanged: centering is deterministic in the train corpus. */
  def semanticBandedOn(tCen: DataFrame, bCen: DataFrame, threshold: Double,
                       bands: Int, planesPerBand: Int, dim: Int): DataFrame = {
    import graft.functions.VectorFunctions._
    // band l's key = l·2^k + its k-bit sign code (plane index l·k+t →
    // bit t) — globally unique per (band, code), so one equi-join
    // covers all L tables at once; loop-shaped (bandKeys) because 64
    // inlined dot literals overflow Janino
    def keys(v: Column): Column = bandKeys(v, bands, planesPerBand, dim)
    // materialization point 2 of 2 (same measurement): the CODED rows
    // before the explode — Catalyst's projection collapse would
    // otherwise inline the key computation into the Generate and the
    // join-level first-band filter, re-running it per exploded key and
    // per candidate pair. One pass over each side; the working set is
    // input + keys — exactly the coded table a persistent index
    // stores; the explode then reads the stored array.
    val tCoded = tCen.select(col("id").as("train_id"),
        col("embedding").as("train_emb"), norm(col("embedding")).as("train_nrm"),
        keys(col("embedding")).as("train_keys"))
      .localCheckpoint(eager = true)
    val bCoded = bCen.select(col("id").as("bench_id"),
        col("embedding").as("bench_emb"), norm(col("embedding")).as("bench_nrm"),
        keys(col("embedding")).as("bench_keys"))
      .localCheckpoint(eager = true)
    bandedPairJoin(tCoded, bCoded, threshold, planesPerBand)
  }

  /** The banded candidate join + first-band exactly-once filter +
    * exact-cosine verify, over pre-coded sides. Shared by the batch
    * path (which checkpoints its inputs) and the STREAMING gate
    * (which must not — checkpointing is illegal on a stream). */
  private def bandedPairJoin(tCoded: DataFrame, bCoded: DataFrame,
                             threshold: Double,
                             planesPerBand: Int): DataFrame = {
    import graft.functions.VectorFunctions._
    val t = tCoded.select(col("train_id"), col("train_emb"), col("train_nrm"),
      col("train_keys"), explode(col("train_keys")).as("key"))
    val b = bCoded.select(col("bench_id"), col("bench_emb"), col("bench_nrm"),
      col("bench_keys"), explode(col("bench_keys")).as("key"))
    val band = shiftright(col("key"), planesPerBand)
    // exactly-once: keep the collision only in the pair's FIRST
    // colliding band — both key arrays ride along, so "no band ℓ < l
    // also collides" is a map-side zip_with scan, not a distinct
    t.join(broadcast(b), Seq("key"))
      .withColumn("band", band)
      .filter(!exists(
        slice(zip_with(col("train_keys"), col("bench_keys"), _ === _),
          lit(1), col("band").cast("int")),
        x => x))
      .select(col("train_id"), col("bench_id"), col("band"),
        (when(col("train_nrm") * col("bench_nrm") === 0.0, lit(0.0))
          .otherwise(dot(col("train_emb"), col("bench_emb"))
            / (col("train_nrm") * col("bench_nrm")))).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Ingest-time contamination gate for a STREAM of training vectors:
    * the benchmark table, the train-frozen quantized mean (`sums` —
    * the artifact an index build stores; see [[Dedup.quantizedSums]]),
    * and therefore every band code on the bench side are STATIC; the
    * hyperplane family is parameter-determined, so codes computed on
    * stream rows join the stored bench codes directly. Per micro-batch
    * this is the identical zero-shuffle plan as [[semanticBanded]]:
    * center (the frozen mean as a driver-side literal — see below),
    * code map-side, explode band keys,
    * broadcast-join the bench, verify exact cosine — no state, no
    * watermark, each arriving vector gates independently. Same output
    * schema/rows as the batch path restricted to the batch's rows
    * (StreamingDecontamSpec pins the equality). */
  def semanticBandedStream(trainStream: DataFrame, bench: DataFrame,
                           sums: DataFrame, threshold: Double, bands: Int,
                           planesPerBand: Int, dim: Int): DataFrame = {
    import graft.functions.VectorFunctions._
    def keys(v: org.apache.spark.sql.Column) =
      bandKeys(v, bands, planesPerBand, dim)
    // The frozen mean becomes a driver-side LITERAL, not a joined row:
    // crossJoining even a broadcast 1-row mean onto a stream plans a
    // BroadcastNestedLoopJoin whose generated consume inlines all
    // `dim` centering expressions — past Janino's 64 KB method limit
    // at dim=64, silently dropping the whole micro-batch plan out of
    // whole-stage codegen (the ~19 ms/row interpreted-fold cliff).
    // Literal-mean centering is one loop-shaped zip_with: zero joins,
    // O(1) generated code in `dim`, bit-identical values.
    val mean = Dedup.gridMean(sums, dim)
    val bCoded = Dedup.centerWithMean(bench, mean)
      .select(col("id").as("bench_id"), col("embedding").as("bench_emb"),
        norm(col("embedding")).as("bench_nrm"),
        keys(col("embedding")).as("bench_keys"))
      .localCheckpoint(eager = true) // static side: build once per query
    val tCoded = Dedup.centerWithMean(trainStream, mean)
      .select(col("id").as("train_id"), col("embedding").as("train_emb"),
        norm(col("embedding")).as("train_nrm"),
        keys(col("embedding")).as("train_keys"))
    bandedPairJoin(tCoded, bCoded, threshold, planesPerBand)
  }

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
