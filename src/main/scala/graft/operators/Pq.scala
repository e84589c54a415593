package graft.operators

import graft.functions.VectorFunctions.dot
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) with asymmetric-distance (ADC) search —
  * the third leg of the quantized-ANN family next to IVF (`Similarity
  * .ivfTopK`) and int8 SQ (`Similarity.sq8TopK`): the embedding is
  * split into `m` subspaces, each subspace gets its own tiny k-means
  * codebook, and a vector is stored as `m` small code ids (64-dim
  * float32 → 4 bytes at m=4/k≤256 — a 64× compression).
  *
  * Search never reconstructs vectors: per query, the dot product of the
  * query's sub-vector with EVERY codebook centroid is a lookup table of
  * m·k entries (tiny — computed once, broadcast), and a candidate's
  * approximate score is the sum of its m table entries.
  *
  * Scale design (100 TB):
  *  - training touches only the codebooks (m tiny k-means runs — the
  *    same exact [[KMeans]] used for IVF);
  *  - encoding is a broadcast of m·k centroids against one corpus scan;
  *  - scoring joins the code table to the broadcast LUT and sums m
  *    integers per candidate — no float vector math on the corpus side
  *    at all.
  *
  * Value-exactness: centroids come from KMeans' quantized means (exact);
  * LUT entries are quantized to the 1e-12 grid via floor and summed AS
  * LONGS, so the per-candidate score is independent of Spark's aggregate
  * accumulation order (double sums are not) and bitwise reproducible in
  * any engine. `adc_hat` = adc_q/1e12 recovers the double scale.
  */
object Pq {

  /** Train per-subspace codebooks: (m, cid, centroid). `corpus`:
    * (id, embedding) with dim = m·subDim.
    *
    * All m subspaces train TOGETHER: the corpus explodes once to
    * (m, id, subvector) rows and each Lloyd's round is one broadcast
    * assignment + one grouped mean over the composite (m, cid) key —
    * one corpus pass per iteration total, not per subspace. The math
    * per subspace is identical to running [[KMeans.train]] on the
    * slice (same init, same fold, same quantized means, same
    * tie-breaks), which the per-subspace oracle CTEs pin. */
  /** (id, embedding) → (m, id, emb) sub-vector rows, all m subspaces in
    * one explode — the shape every PQ stage joins its codebooks to. */
  private def subvecs(df: DataFrame, m: Int, subDim: Int): DataFrame =
    df.select(col("id"),
        explode(transform(sequence(lit(0), lit(m - 1)), j =>
          struct(j.as("m"),
            transform(slice(col("embedding"), j * subDim + 1, lit(subDim)),
              _.cast("double")).as("emb")))).as("s"))
      .select(col("s.m").as("m"), col("id"), col("s.emb").as("emb"))

  def train(corpus: DataFrame, m: Int, subDim: Int, k: Int,
            iters: Int): DataFrame = {
    val v = subvecs(corpus, m, subDim)
      .localCheckpoint() // m·|corpus| sub-rows feed every round once
    // the k corpus vectors with the SMALLEST ids — not `id < k`, which
    // silently under-seeds (or empties) the codebook for sparse or
    // non-zero-based id spaces (same contract as KMeans.train)
    val seedIds = corpus.select(col("id")).orderBy(col("id")).limit(k)
    var cents = v.join(broadcast(seedIds), Seq("id"))
      .select(col("m"), col("id").as("cid"), col("emb").as("cent"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val dist = aggregate(
        zip_with(col("emb"), col("cent"), (x, y) => (x - y) * (x - y)),
        lit(0.0), _ + _)
      val w = Window.partitionBy(col("m"), col("id"))
        .orderBy(col("dist"), col("cid"))
      val assigned = v.join(broadcast(cents), Seq("m"))
        .select(col("m"), col("id"), col("emb"), col("cid"), dist.as("dist"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("m"), col("id"), col("emb"), col("cid"))
      val means = assigned
        .select(col("m"), col("cid"), posexplode(col("emb")).as(Seq("pos", "x")))
        .groupBy(col("m"), col("cid"), col("pos"))
        // DECIMAL(38,0), not LONG: a long accumulator overflows past
        // ~9.2M cluster members of unit-scale values (same fix as
        // KMeans.train, whose math this must stay identical to)
        .agg((sum(floor(col("x") * 1e12).cast("decimal(38,0)")).cast("double")
                / 1e12 / count(lit(1)).cast("double")).as("mean"))
        .groupBy(col("m"), col("cid"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("mean")))),
          e => e.getField("mean")).as("cent_new"))
      cents = cents.join(means, Seq("m", "cid"), "left")
        .select(col("m"), col("cid"),
          coalesce(col("cent_new"), col("cent")).as("cent"))
        .localCheckpoint() // m·k·subDim doubles — trivially small
    }
    cents.select(col("m"), col("cid"), col("cent").as("centroid"))
  }

  /** Encode every corpus vector as m code ids: (id, m, cid). Ties in
    * the per-subspace argmin break toward the smaller cid (same rule as
    * KMeans assignment). All m subspaces encode in ONE job: sub-vector
    * rows equi-join the broadcast codebooks on the subspace id and one
    * window over (m, id) takes the argmin — not m unioned branches. */
  def encode(corpus: DataFrame, codebooks: DataFrame, m: Int,
             subDim: Int): DataFrame = {
    val cents = codebooks.select(col("m"), col("cid"),
      col("centroid").as("cent"))
    val d = aggregate(
      zip_with(col("emb"), col("cent"), (x, y) => (x - y) * (x - y)),
      lit(0.0), _ + _)
    val w = Window.partitionBy(col("m"), col("id"))
      .orderBy(col("dist"), col("cid"))
    subvecs(corpus, m, subDim).join(broadcast(cents), Seq("m"))
      .select(col("m"), col("id"), col("cid"), d.as("dist"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("m"), col("cid"))
  }

  /** Per-query lookup table: (query_id, m, cid, qd) where qd =
    * floor(dot(q_sub_m, centroid_{m,cid})·1e12) as an exact long.
    * Same one-job composite-key shape as [[encode]]. */
  private[operators] def lut(queries: DataFrame, codebooks: DataFrame, m: Int,
                             subDim: Int): DataFrame =
    subvecs(queries, m, subDim)
      .withColumnRenamed("id", "query_id")
      .join(broadcast(codebooks.select(col("m"), col("cid"), col("centroid"))),
        Seq("m"))
      .select(col("query_id"), col("m"), col("cid"),
        floor(dot(col("emb"), col("centroid")) * 1e12).cast("long").as("qd"))

  /** ADC top-k: approximate dot(query, candidate) = Σ_m LUT[m][code_m].
    * Output: (query_id, vec_id, adc_q, adc_hat, rank ≤ k). */
  def adcTopK(queries: DataFrame, corpus: DataFrame, codebooks: DataFrame,
              m: Int, subDim: Int, k: Int): DataFrame = {
    val codes = encode(corpus, codebooks, m, subDim)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_q").desc, col("vec_id"))
    codes.join(broadcast(lut(queries, codebooks, m, subDim)), Seq("m", "cid"))
      .filter(col("id") =!= col("query_id"))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("qd")).as("adc_q")) // exact long sum: order-free
      .select(col("query_id"), col("id").as("vec_id"), col("adc_q"),
        (col("adc_q").cast("double") / 1e12).as("adc_hat"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Exact re-rank of the ADC page — the production recall fix that
    * q74's measurement exists to size: ADC ranks a `shortlist` of
    * candidates per query (cheap, code-table only), then ONLY those
    * `shortlist`·|queries| rows rejoin the corpus for the true cosine,
    * and the final top-k is exact over the page. The corpus-side cost
    * stays one code-table scan plus an equi-join that touches
    * `shortlist` embeddings per query — at 100 TB the full-precision
    * vectors are read for a few dozen rows per query, never scanned.
    * Recall@k is then bounded only by whether the true top-k made the
    * ADC page (measured in q77), not by quantization ranking noise.
    * Output: (query_id, vec_id, sim, rank ≤ k), sim = exact cosine. */
  def adcRerank(queries: DataFrame, corpus: DataFrame, codebooks: DataFrame,
                m: Int, subDim: Int, shortlist: Int, k: Int): DataFrame = {
    import graft.functions.VectorFunctions.norm
    val page = adcTopK(queries, corpus, codebooks, m, subDim, shortlist)
      .select(col("query_id"), col("vec_id"))
    val q = queries.select(col("id").as("query_id"),
      col("embedding").as("q_emb"), norm(col("embedding")).as("q_norm"))
    val c = corpus.select(col("id").as("vec_id"),
      col("embedding").as("c_emb"), norm(col("embedding")).as("c_norm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    page.join(c, Seq("vec_id")) // only the page's embeddings are read
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        (when(col("q_norm") * col("c_norm") === 0.0, lit(0.0))
          .otherwise(dot(col("q_emb"), col("c_emb"))
            / (col("q_norm") * col("c_norm"))))
          .as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** The composed 100 TB search shape: IVF coarse cells prune the
    * candidate set (nprobe/|cells| of the corpus per query), PQ-ADC
    * scores only the survivors — the corpus side touches nothing but
    * its cell assignment and m code ids. `coarse`: (cid, embedding)
    * full-dimension coarse centroids (cosine assignment, as
    * [[Similarity.ivfAssign]]). Output: (query_id, vec_id, cell,
    * adc_q, adc_hat, rank ≤ k). */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, coarse: DataFrame,
                codebooks: DataFrame, nprobe: Int, m: Int, subDim: Int,
                k: Int): DataFrame = {
    val assignment = Similarity.ivfAssign(corpus, coarse)
      .select(col("id").as("vec_id"), col("cid").as("cell"))
    val codes = encode(corpus, codebooks, m, subDim)
      .withColumnRenamed("id", "vec_id")
    ivfPqScore(queries, coarse, codebooks, assignment, codes,
      nprobe, m, subDim, k, dedupCandidates = false)
  }

  /** The shared IVF→ADC scorer over PRECOMPUTED (assignment, codes)
    * tables — [[ivfPqTopK]] passes freshly-encoded ones, a persistent
    * index ([[VectorIndex.search]]) passes its stored tables, so the
    * probe selection and tie-breaks cannot silently diverge between the
    * computed and stored paths (the equality the index spec pins).
    * `dedupCandidates` collapses IDENTICAL duplicate assignment/code
    * rows (at-least-once index ingest) before the ADC sum — candidate-
    * sized, skipped on the freshly-computed path where duplicates are
    * impossible. */
  /** The probe set — (query_id, cell), the `nprobe` nearest coarse
    * cells per query by cosine, ties broken on cell id. ONE function
    * shared by [[ivfPqScore]]'s in-plan candidate join and the file-
    * pruning path ([[VectorIndex.search]] collects `cell` from exactly
    * this to scan only the probed cells' files), so the cells a search
    * scores and the cells its storage scan keeps cannot diverge. */
  def probeCells(queries: DataFrame, coarse: DataFrame,
                 nprobe: Int): DataFrame = {
    import graft.functions.VectorFunctions.norm
    val c = coarse.select(col("cid").as("cell"),
      col("embedding").as("cent_emb"), norm(col("embedding")).as("cent_norm"))
    val q = queries.select(col("id").as("query_id"),
      col("embedding").as("q_emb"), norm(col("embedding")).as("q_norm"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("cent_sim").desc, col("cell"))
    q.crossJoin(broadcast(c))
      .select(col("query_id"), col("cell"),
        (when(col("q_norm") * col("cent_norm") === 0.0, lit(0.0))
          .otherwise(dot(col("q_emb"), col("cent_emb"))
            / (col("q_norm") * col("cent_norm"))))
          .as("cent_sim"))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("cell"))
  }

  private[operators] def ivfPqScore(queries: DataFrame, coarse: DataFrame,
                                    codebooks: DataFrame, assignment: DataFrame,
                                    codes: DataFrame, nprobe: Int, m: Int,
                                    subDim: Int, k: Int,
                                    dedupCandidates: Boolean): DataFrame = {
    val probes = probeCells(queries, coarse, nprobe)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_q").desc, col("vec_id"))
    val cand0 = assignment.join(broadcast(probes), Seq("cell"))
      .join(codes, Seq("vec_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("cell"), col("vec_id"), col("m"),
        col("cid"))
    val cand = if (dedupCandidates) cand0.distinct() else cand0
    cand.join(broadcast(lut(queries, codebooks, m, subDim)),
        Seq("query_id", "m", "cid"))
      .groupBy(col("query_id"), col("vec_id"), col("cell"))
      .agg(sum(col("qd")).as("adc_q"))
      .select(col("query_id"), col("vec_id"), col("cell"), col("adc_q"),
        (col("adc_q").cast("double") / 1e12).as("adc_hat"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
