package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Scale design (100 TB):
  *  - Exact dedup is one hash-shuffle groupBy on a 32-byte digest — the
  *    map-side partial aggregation makes the shuffle carry only distinct
  *    digests per partition.
  *  - MinHash-LSH avoids the O(n²) pair space entirely: candidates come
  *    from an equi-join on (band, bandKey), i.e. one shuffle keyed by the
  *    band hash; only colliding docs are compared. Signature computation
  *    is explode → groupBy(min…), all map-side-combinable.
  *  - SimHash buckets near-dups by Hamming-adjacent fingerprints; the
  *    bucket key join is again a plain equi-join.
  *  - The all-pairs `ngramJaccardPairs` is intentionally block-scoped
  *    (caller supplies a blocking predicate) — it is the verification/
  *    test-scale path, LSH is the scale path.
  */
object Dedup {

  /** Exact duplicate groups: md5(text) → canonical (min) id + count. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("canonical_id"),
           count(lit(1)).as("n_copies"))

  /** Per-doc distinct word-n-gram shingle rows: (id, shingle). Tokens
    * are staged through a projection so the split runs once per doc,
    * not once per shingle slot. */
  def shingleRows(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("_toks"))
      .select(col("doc_id"),
              explode(wordShinglesFromTokens(col("_toks"), n)).as("shingle"))

  /** MinHash signature: k md5-derived min-hashes over the shingle set.
    * Hash j of a shingle is md5("<j>|<shingle>") — a string min is as
    * uniform as an integer min and reproducible in any engine. */
  def minhashSignatures(shingles: DataFrame, k: Int): DataFrame = {
    val hashes = (0 until k).map(j =>
      min(md5(concat(lit(s"$j|"), col("shingle")))).as(s"h$j"))
    shingles.groupBy(col("doc_id")).agg(hashes.head, hashes.tail: _*)
  }

  /** LSH band keys: `bands` bands of `rowsPerBand` signature slots each;
    * key = md5 of the concatenated slots. Output: (doc_id, band, band_key).
    * rowsPerBand must be ≥ 1: zero slots would give EVERY doc the same
    * band key (md5 of the empty concat) and the candidate join becomes
    * the full n² cross product LSH exists to avoid. Callers derive
    * rowsPerBand = k / bands, so k must divide by bands — a remainder
    * would silently never band the trailing signature slots. */
  def lshBands(sig: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    require(bands >= 1 && rowsPerBand >= 1,
      s"need bands >= 1 and rowsPerBand >= 1, got bands=$bands rows=$rowsPerBand")
    val bandRows = (0 until bands).map { b =>
      val slots = (b * rowsPerBand until (b + 1) * rowsPerBand).map(j => col(s"h$j"))
      sig.select(col("doc_id"), lit(b).as("band"),
                 md5(concat(slots: _*)).as("band_key"))
    }
    bandRows.reduce(_ union _)
  }

  /** Near-duplicate pairs via MinHash-LSH, verified with exact Jaccard.
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold. */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
                 shingleN: Int = 3, k: Int = 8, bands: Int = 2,
                 threshold: Double = 0.5): DataFrame = {
    require(bands >= 1 && k % bands == 0,
      s"k must divide into bands (got k=$k, bands=$bands) — a remainder " +
      "would silently drop trailing signature slots from banding")
    // shingle rows feed three consumers (signatures + both sides of the
    // Jaccard verify) — persist so tokenize/shingle runs once, not thrice
    val sh = shingleRows(docs, idCol, textCol, shingleN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // sig feeds both band branches and both sides of the candidate
    // self-join — without the persist it would be recomputed 4×
    val sig = minhashSignatures(sh, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandDf = lshBands(sig, bands, k / bands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = bandDf.select(col("band"), col("band_key"), col("doc_id").as("id_a"))
    val b = bandDf.select(col("band"), col("band_key"), col("doc_id").as("id_b"))
    val cand = a.join(b, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    // materialize the (small) verified-pairs result, then drop the
    // pipeline caches — without this a long-lived session leaks the
    // shingle/signature/band blocks of every near-dup call it ever ran
    val out = verifyJaccard(cand, sh, threshold).localCheckpoint(eager = true)
    sh.unpersist(blocking = false)
    sig.unpersist(blocking = false)
    bandDf.unpersist(blocking = false)
    out
  }

  /** Exact Jaccard for candidate pairs from shingle rows (shuffle joins
    * keyed on shingle set membership — no cross product). */
  def verifyJaccard(cand: DataFrame, shingles: DataFrame,
                    threshold: Double): DataFrame = {
    val counts = shingles.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    // composite-key equi-join (id_b, shingle): the hash join emits only
    // actual intersections — joining on id alone and post-filtering the
    // shingle equality would materialize |cand| × |sh_a| × |sh_b| rows
    val inter = cand
      .join(shingles.select(col("doc_id").as("id_a"), col("shingle")), Seq("id_a"))
      .join(shingles.select(col("doc_id").as("id_b"), col("shingle")), Seq("id_b", "shingle"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(counts.select(col("doc_id").as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(counts.select(col("doc_id").as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("n_inter").cast("double") /
         (col("n_a") + col("n_b") - col("n_inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Near-dup pairs between a NEW batch and an already-processed corpus
    * — the incremental-crawl shape: dedupe incoming documents against
    * everything ingested so far without touching the corpus text.
    * Candidates come from the batch-bands ⋈ corpus-bands equi-join
    * (shuffle sized by the batch plus colliding corpus rows, never the
    * corpus pair space); verification is SIGNATURE AGREEMENT — the
    * fraction of matching minhash slots, the standard unbiased Jaccard
    * estimator — rather than exact shingle Jaccard, because the
    * incremental path must work from stored signatures alone
    * ([[graft.operators.NearDupIndex]] persists signatures and band
    * keys, not text; re-shingling the corpus would re-read 100 TB per
    * batch). Batch-internal duplicates are [[minhashLsh]]'s job.
    * Output: (new_id, corpus_id, est_jaccard ≥ minEst). */
  def minhashLshAcross(batch: DataFrame, corpus: DataFrame,
                       idCol: String, textCol: String,
                       shingleN: Int = 3, k: Int = 8, bands: Int = 2,
                       minEst: Double = 0.5): DataFrame = {
    require(bands >= 1 && k % bands == 0,
      s"k must divide into bands (got k=$k, bands=$bands)")
    // each side's signatures feed its band derivation AND the estimate
    // join: materialize once per side
    val bs = minhashSignatures(shingleRows(batch, idCol, textCol, shingleN), k)
      .localCheckpoint(eager = true)
    val cs = minhashSignatures(shingleRows(corpus, idCol, textCol, shingleN), k)
      .localCheckpoint(eager = true)
    sigEstimatePairs(bs, lshBands(bs, bands, k / bands),
                     cs, lshBands(cs, bands, k / bands), k, minEst)
  }

  /** The shared cross-corpus scorer over (signature, band) tables —
    * [[minhashLshAcross]] passes freshly-computed ones, the persistent
    * [[graft.operators.NearDupIndex]] passes its stored tables, so
    * candidate generation and the slot-agreement estimate cannot
    * silently diverge between the computed and stored paths. The final
    * distinct is pair-sized and collapses the duplicate rows an
    * at-least-once index ingest can leave. */
  private[operators] def sigEstimatePairs(batchSig: DataFrame,
                                          batchBands: DataFrame,
                                          corpusSig: DataFrame,
                                          corpusBands: DataFrame,
                                          k: Int, minEst: Double): DataFrame = {
    val cand = batchBands
      .select(col("band"), col("band_key"), col("doc_id").as("new_id"))
      .join(corpusBands.select(col("band"), col("band_key"),
                               col("doc_id").as("corpus_id")),
            Seq("band", "band_key"))
      // a batch doc replayed with an id the corpus already has would
      // otherwise report itself as its own near-dup (est = 1.0)
      .filter(col("new_id") =!= col("corpus_id"))
      .select(col("new_id"), col("corpus_id"))
      .distinct()
    val a = batchSig.select(
      col("doc_id").as("new_id") +:
        (0 until k).map(j => col(s"h$j").as(s"a_h$j")): _*)
    val b = corpusSig.select(
      col("doc_id").as("corpus_id") +:
        (0 until k).map(j => col(s"h$j").as(s"b_h$j")): _*)
    val nMatch = (0 until k)
      .map(j => when(col(s"a_h$j") === col(s"b_h$j"), 1).otherwise(0))
      .reduce(_ + _)
    cand.join(a, Seq("new_id")).join(b, Seq("corpus_id"))
      .select(col("new_id"), col("corpus_id"),
        (nMatch.cast("double") / k).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEst)
      .distinct()
  }

  /** Connected components over near-dup pairs → duplicate clusters with
    * the min-id member as the canonical document (what a dedup pipeline
    * actually drops rows by). Iterative min-label propagation: each
    * round every node takes the min label among itself and its
    * neighbors; converges in ≤ graph-diameter rounds (dup clusters are
    * tiny — pairs/triples — so 2-3 rounds in practice). Per-round cost
    * is ONE equi-join + one aggregate, both shuffle-keyed on the node
    * id, and ONE action: the old label travels alongside the new one so
    * convergence is a count over the already-materialized round output —
    * no separate compare-join job per round.
    *
    * Input: (id_a, id_b) pairs. Output: (doc_id, cluster_id) for every
    * node that appears in some pair. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    // persist the pair source BEFORE the two-orientation union: the
    // union's branches are separate subtrees to Spark, so an unpersisted
    // `pairs` (often a whole LSH pipeline) would be computed twice when
    // `edges` first materializes (measured 2× on q44)
    val p = pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edges = p.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(p.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var persisted = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the init materialization doubles as a size probe: when the label
    // table fits in a broadcast (node count ≪ corpus — the normal LSH
    // outcome), hint both per-round joins broadcast so a round is one
    // map-side job instead of shuffle+sort stages; past the limit the
    // rounds fall back to shuffle joins (the 100 TB path)
    val nNodes = persisted.count()
    val hinted: DataFrame => DataFrame =
      if (nNodes <= broadcastNodeLimit) broadcast(_) else identity
    var labels = persisted
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      iter += 1
      val neighborMin = edges
        .join(hinted(labels.select(col("id").as("dst"), col("label"))), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("label")).as("nbr_label"))
      val next = labels.withColumnRenamed("label", "old")
        .join(hinted(neighborMin), Seq("id"), "left")
        .select(col("id"),
          least(col("old"), coalesce(col("nbr_label"), col("old"))).as("label"),
          col("old"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // one job: materializes the persist AND answers convergence
      converged = next.filter(col("label") =!= col("old")).count() == 0
      persisted.unpersist(false)
      persisted = next
      labels = next.select(col("id"), col("label")) // drop `old` for the next rename
    }
    // the label table is tiny (one row per node in some dup pair);
    // checkpoint it eagerly so every intermediate cache — including the
    // whole LSH pipeline behind `pairs` — can be dropped immediately
    // instead of leaking for the life of the session
    val out = labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
      .localCheckpoint(eager = true)
    persisted.unpersist(blocking = false)
    edges.unpersist(blocking = false)
    p.unpersist(blocking = false)
    out
  }

  /** Above this node count the per-round label joins stop broadcasting
    * and fall back to shuffle joins (a broadcast of the label table
    * must fit executor memory; 1M (id,label) longs ≈ 16 MB). */
  private val broadcastNodeLimit = 1000000L

  /** 16-bit SimHash fingerprint per document: for each bit position the
    * sign of Σ_tokens (2·bit(hash16(token)) − 1). Kept at 16 bits so the
    * oracle SQL stays writable; the production variant would widen the
    * same construction to 64 bits. */
  def simhash16(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
                          explode(tokens(col(textCol))).as("token"))
      .withColumn("h", hash16(col("token")))
    val bitSums = (0 until 16).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"s$b"))
    val fused = (0 until 16).map(b =>
      when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    tok.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), fused.as("simhash"))
  }

  /** SimHash near-dup pairs within Hamming distance ≤ 1, by multiprobe:
    * each doc probes its own fingerprint plus every 1-bit flip (17 keys
    * at 16 bits), candidates come from the probe↔identity equi-join —
    * the Hamming-ball analogue of the ANN multiprobe (Similarity.annTopK
    * probeHamming1). A pair at distance d ≤ 1 collides on EXACTLY one
    * probe key (identity for d=0, the flipped bit for d=1), so the join
    * emits each pair once; no n² pair space anywhere. The probe explode
    * multiplies the (doc, fingerprint) table by nBits+1 — at 64
    * production bits that is 65 small rows per doc, still corpus-scan
    * dominated. Output: (id_a, id_b, hamming ≤ 1). */
  def simhashNearDup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // the fingerprint aggregation feeds both join sides: materialize once
    val sh = simhash16(docs, idCol, textCol).localCheckpoint(true)
    val probes = sh.select(col("doc_id").as("id_a"), col("simhash").as("h_a"),
      explode(array(
        (0 until 16).map(j => col("simhash").bitwiseXOR(lit(1L << j))) :+
          col("simhash"): _*)).as("probe"))
    val idn = sh.select(col("doc_id").as("id_b"), col("simhash").as("h_b"),
      col("simhash").as("probe"))
    probes.join(idn, Seq("probe"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("long").as("hamming"))
  }

  /** [[simhashNearDup]] at production width: 64-bit fingerprints
    * (xxhash64 tokens, map-only per-row SimHash — no explode+groupBy
    * stage at all), 65 probe keys per doc. Same exactly-one-collision
    * argument; the probe explode is 65 small (probe, id, fingerprint)
    * rows per doc, still corpus-scan dominated. Spec-verified against
    * brute Hamming (Simhash64Spec) — the 16-bit form keeps the DuckDB
    * oracle, this one keeps the production bit budget. */
  def simhashNearDup64(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.TextFunctions.{simhash64FromHashes, tokenHashes64}
    val sh = docs
      .withColumn("_hs", tokenHashes64(col(textCol)))
      .select(col(idCol).as("doc_id"), simhash64FromHashes(col("_hs")).as("simhash"))
      .localCheckpoint(true)
    val probes = sh.select(col("doc_id").as("id_a"), col("simhash").as("h_a"),
      explode(array(
        (0 until 64).map(j => col("simhash").bitwiseXOR(lit(1L << j))) :+
          col("simhash"): _*)).as("probe"))
    val idn = sh.select(col("doc_id").as("id_b"), col("simhash").as("h_b"),
      col("simhash").as("probe"))
    probes.join(idn, Seq("probe"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("h_a").bitwiseXOR(col("h_b"))).cast("long").as("hamming"))
  }

  /** Embedding-cosine near-duplicate pairs, LSH-bucketed: candidates
    * come from an equi-join on the hyperplane bucket (map-only
    * assignment, no cross product), then exact cosine filters. Same
    * trade as MinHash-LSH: recall < 1 for pairs whose signs straddle a
    * plane, ~4^-planes reduction in compared pairs.
    * Input: (id, embedding). Output: (id_a, id_b, bucket, sim). */
  def embeddingNearDup(vecs: DataFrame, threshold: Double,
                       nPlanes: Int, dim: Int): DataFrame = {
    import graft.functions.VectorFunctions._
    val withBucket = vecs.select(
      col("id"), col("embedding"),
      hyperplaneBucket(col("embedding"), nPlanes, dim).as("bucket"),
      norm(col("embedding")).as("nrm"))
    val a = withBucket.select(col("bucket"), col("id").as("id_a"),
      col("embedding").as("emb_a"), col("nrm").as("nrm_a"))
    val b = withBucket.select(col("bucket"), col("id").as("id_b"),
      col("embedding").as("emb_b"), col("nrm").as("nrm_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("bucket"),
        (when(col("nrm_a") * col("nrm_b") === 0.0, lit(0.0))
        .otherwise(dot(col("emb_a"), col("emb_b"))
          / (col("nrm_a") * col("nrm_b")))).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** All-pairs n-gram Jaccard within caller-restricted blocks —
    * verification-scale only (the LSH path is the 100 TB route). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        charN: Int, threshold: Double): DataFrame = {
    val withSh = docs.select(col(idCol).as("doc_id"),
                             charShingles(col(textCol), charN).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = withSh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = withSh.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    val out = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      // intersect computed once per pair (the helper would do it twice)
      .withColumn("n_inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .select(col("id_a"), col("id_b"),
        (col("n_inter").cast("double") /
         ((size(col("sh_a")) + size(col("sh_b"))).cast("double") - col("n_inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .localCheckpoint(eager = true) // then drop the shingle cache
    withSh.unpersist(blocking = false)
    out
  }
}
