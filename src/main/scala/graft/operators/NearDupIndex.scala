package graft.operators

import graft.gdl.TableStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persistent MinHash-LSH document index over a [[TableStore]] — the
  * document analogue of [[VectorIndex]], and the operator behind
  * incremental crawl dedup: ingest a corpus once, then dedupe each
  * incoming batch against everything seen so far in O(batch), never
  * re-reading or re-shingling corpus text.
  *
  * Cross-table snapshot isolation mirrors [[VectorIndex]]: each build
  * writes a fresh EPOCH of data tables, then flips ONE pointer —
  *  - `<name>_meta`          — single row (build_epoch); the atomic flip
  *  - `<name>_e<E>_sig`      — (doc_id, h0..h{k-1}) minhash signatures
  *  - `<name>_e<E>_bands`    — (doc_id, band, band_key) LSH bucket keys
  *  - `<name>_e<E>_clusters` — (doc_id, cluster_id, upd_seq) label deltas
  *
  * A rebuild never mutates the published epoch, so a query that
  * resolved the pointer reads one consistent signing even while a
  * rebuild writes (or crashes writing) the next epoch; a crashed
  * rebuild leaves the old epoch serving. A FIRST build that crashes
  * leaves no pointer → readers fail loudly. [[vacuumEpochs]] reclaims
  * superseded epochs once stale readers are gone.
  *
  * The hash family is parameter-determined (md5-derived, no trained
  * state), so batch-side signatures computed at query time are directly
  * comparable with stored ones — there is nothing to "retrain" and a
  * refresh can never drift from the build. Scale: a query shuffles the
  * batch bands against the stored band table (equi-join on band_key);
  * the corpus-sized tables are only ever scanned, never crossed.
  *
  * Verification is signature agreement (matching-slot fraction, the
  * unbiased Jaccard estimator) because the index stores signatures, not
  * text — see [[Dedup.minhashLshAcross]], which shares the scorer so
  * the stored and computed paths cannot diverge.
  */
final class NearDupIndex(store: TableStore, name: String,
                         shingleN: Int = 3, k: Int = 8, bands: Int = 2) {

  private def meta = s"${name}_meta"
  private def t(epoch: Long, suffix: String) = s"${name}_e${epoch}_$suffix"

  /** The published epoch, or None before the first completed build. */
  private def publishedEpoch: Option[Long] =
    store.read(meta).flatMap(df =>
      df.select(col("build_epoch")).collect().headOption.map(_.getLong(0)))

  private def requireEpoch(): Long =
    publishedEpoch.getOrElse(throw new IllegalStateException(
      s"near-dup index '$name' has no published build — not built, or " +
      "the first build crashed before the pointer commit; rebuild required"))

  private def required(epoch: Long, suffix: String): DataFrame =
    store.read(t(epoch, suffix)).getOrElse(throw new IllegalStateException(
      s"near-dup index '$name' is missing table '${t(epoch, suffix)}' — a " +
      "build crashed mid-way, or its epoch was vacuumed under a stale " +
      "pointer; rebuild required"))

  private def signatures(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame =
    Dedup.minhashSignatures(
      Dedup.shingleRows(docs, idCol, textCol, shingleN), k)

  /** Index `docs` (idCol, textCol) from scratch into a new epoch; the
    * pointer flips last (crash safety — see class doc). The previous
    * epoch — including its cluster table — stays published until the
    * flip; labels derive from the pair graph, so the new epoch starts
    * with no clusters until [[buildClusters]] re-seeds it. */
  def build(docs: DataFrame, idCol: String, textCol: String): Unit = {
    import docs.sparkSession.implicits._
    val epoch = store.history(meta).lastOption.map(_._1 + 1).getOrElse(0L)
    // signatures feed the band derivation and the stored table: one pass
    val sig = signatures(docs, idCol, textCol).localCheckpoint(eager = true)
    store.overwrite(t(epoch, "sig"), sig)
    store.overwrite(t(epoch, "bands"), Dedup.lshBands(sig, bands, k / bands))
    store.overwrite(meta, Seq(epoch).toDF("build_epoch")) // atomic flip
  }

  /** Reclaim superseded epochs' space (empty + gc; tombstone names
    * remain). NOT called from [[build]] — in-flight readers holding the
    * previous pointer must be able to finish first. */
  def vacuumEpochs(): Unit = {
    val current = requireEpoch()
    for (e <- 0L until current; suffix <- Seq("sig", "bands", "clusters")) {
      store.read(t(e, suffix)).foreach { df =>
        store.overwrite(t(e, suffix), df.limit(0))
        store.gc(t(e, suffix))
      }
    }
  }

  /** Add `newDocs` to the index — O(new docs + one doc_id-column scan
    * of the stored band table). Already-indexed ids are DROPPED, not
    * re-signed: a re-seen id with changed text would otherwise leave
    * two signature rows whose band keys BOTH generate candidates and
    * whose slot agreement is ambiguous. Re-ingesting an existing id is
    * a rebuild, not a refresh. The epoch is resolved once, so both
    * appends land in the same signing even if a rebuild publishes
    * mid-call. */
  def refresh(newDocs: DataFrame, idCol: String, textCol: String): Unit = {
    val epoch = requireEpoch()
    // anti-join on the LAST-appended table (bands): a crash between the
    // sig and bands appends must leave the batch retryable — an
    // anti-join on sig would drop the half-ingested ids on replay and
    // leave them permanently without band keys (zero candidates — their
    // future near-dups silently accepted). Replayed sig rows are
    // identical duplicates, collapsed by the pair-sized distinct.
    val fresh = newDocs
      .join(required(epoch, "bands").select(col("doc_id").as(idCol)).distinct(),
        Seq(idCol), "left_anti")
    val sig = signatures(fresh, idCol, textCol).localCheckpoint(eager = true)
    if (!sig.isEmpty) {
      store.append(t(epoch, "sig"), sig)
      store.append(t(epoch, "bands"), Dedup.lshBands(sig, bands, k / bands))
    }
  }

  /** One step of the incremental-index loop: consume the `sourceTable`
    * change feed past `sinceSeq` (document rows), index whatever is
    * new, and return the seq to checkpoint for the next poll. Snapshot-
    * first, so the step is exactly-once under concurrent appends —
    * rows committed after the snapshot wait for the next poll, never
    * skipped or double-indexed (see [[VectorIndex.refreshFrom]], the
    * same discipline). Propagates the feed's typed failures (an
    * overwritten source needs a rebuild; vacuumed history a
    * re-bootstrap). */
  def refreshFrom(sourceTable: String, sinceSeq: Long,
                  idCol: String, textCol: String): Long = {
    val snap = store.history(sourceTable).lastOption.map(_._1)
      .getOrElse(return sinceSeq) // source never written: nothing to do
    if (snap <= sinceSeq) return sinceSeq
    store.readChangesSince(sourceTable, sinceSeq, untilSeq = snap)
      .foreach(df => refresh(df.select(col(idCol), col(textCol)),
                             idCol, textCol))
    snap
  }

  /** Streaming form: each micro-batch of documents is signed against
    * the parameter-determined hash family and appended, keeping the
    * index current with a live crawl. Caller starts/stops the returned
    * writer (and owns the checkpoint location). foreachBatch's
    * at-least-once replay on restart is harmless here — [[refresh]]
    * anti-joins already-indexed ids, so a replayed batch appends
    * nothing at all. */
  def refreshStream(stream: DataFrame, idCol: String, textCol: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          refresh(batch.select(col(idCol), col(textCol)), idCol, textCol)
      }

  /** Near-dup pairs between `batch` (idCol, textCol) and the indexed
    * corpus: (new_id, corpus_id, est_jaccard ≥ minEst). Runs the SAME
    * scorer as [[Dedup.minhashLshAcross]] over the stored tables; the
    * pair-sized distinct inside it collapses duplicate rows left by an
    * at-least-once ingest retry. Pointer resolved once → sig and bands
    * come from the same signing. */
  def query(batch: DataFrame, idCol: String, textCol: String,
            minEst: Double = 0.5): DataFrame = {
    val epoch = requireEpoch()
    val bs = signatures(batch, idCol, textCol).localCheckpoint(eager = true)
    Dedup.sigEstimatePairs(bs, Dedup.lshBands(bs, bands, k / bands),
      required(epoch, "sig"), required(epoch, "bands"), k, minEst)
  }

  /** [[query]] PLUS the batch's own internal near-dup pairs from one
    * shared signing pass — the exact pair inputs an incremental
    * cluster-maintenance step needs (cross via stored-table slot
    * agreement, internal via exact Jaccard on the batch's shingles).
    * Non-mutating like [[query]]. Returns (cross (new_id, corpus_id,
    * est_jaccard), internal (id_a, id_b, jaccard)). */
  def queryBatch(batch: DataFrame, idCol: String, textCol: String,
                 minEst: Double = 0.5): (DataFrame, DataFrame) = {
    val epoch = requireEpoch()
    val sh = Dedup.shingleRows(batch, idCol, textCol, shingleN)
      .localCheckpoint(eager = true) // feeds signatures AND the verify
    val bs = Dedup.minhashSignatures(sh, k).localCheckpoint(eager = true)
    val bb = Dedup.lshBands(bs, bands, k / bands)
      .localCheckpoint(eager = true) // feeds the cross join AND internal
    val cross = Dedup.sigEstimatePairs(bs, bb,
      required(epoch, "sig"), required(epoch, "bands"), k, minEst)
    val internal = Dedup.minhashLshFrom(sh, bb, minEst)
    (cross, internal)
  }

  // ---- incremental duplicate-cluster maintenance --------------------
  //
  // `<name>_e<E>_clusters` holds (doc_id, cluster_id, upd_seq) as
  // last-wins deltas: `buildClusters` seeds it from the corpus pair
  // graph, each `refreshClusters` appends ONLY the affected slice
  // (members of clusters a new pair touches, plus the new nodes)
  // recomputed by Dedup.mergeClustersDelta — O(batch + affected
  // members) per batch, never an O(corpus) label rewrite. Readers
  // resolve with readLatestBy(doc_id, upd_seq).

  private def nextClusterSeq(epoch: Long): Long =
    store.history(t(epoch, "clusters")).lastOption.map(_._1 + 1).getOrElse(0L)

  private def stamp(labels: DataFrame, seq: Long): DataFrame =
    labels.select(col("doc_id"), col("cluster_id"),
                  lit(seq).cast("long").as("upd_seq"))

  /** Current duplicate-cluster labels: (doc_id, cluster_id), last-wins
    * over the delta chain. Empty table (not an error) before
    * [[buildClusters]] — callers distinguish "no clusters yet" from a
    * half-built signature index via the pointer check. */
  def clusters(): DataFrame = {
    val epoch = requireEpoch()
    store.readLatestBy(t(epoch, "clusters"), Seq("doc_id"), "upd_seq")
      .map(_.select(col("doc_id"), col("cluster_id")))
      .getOrElse {
        val spark = required(epoch, "sig").sparkSession
        import spark.implicits._
        Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id")
      }
  }

  /** Point lookup: current labels for just `docIds` — (doc_id,
    * cluster_id), last-wins over the delta chain exactly like
    * [[clusters]], but resolved from ONLY the rows (and files) that
    * can hold those ids. The cluster table is an append-mostly delta
    * chain whose doc ids interleave across every file ([min,max] zones
    * prune nothing), so this is the Bloom sidecar's case: `scan` opens
    * just the files whose `doc_id` sketches might contain a requested
    * id — O(matching files), not O(label history). The window then
    * runs over requested-ids-sized input, not the corpus. */
  def clusterOf(docIds: Seq[Any]): DataFrame = {
    val epoch = requireEpoch()
    val matched =
      if (docIds.isEmpty) None
      else store.scan(t(epoch, "clusters"), col("doc_id").isin(docIds: _*))
    matched.map { df =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(desc("upd_seq"))
      df.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn")
        .select(col("doc_id"), col("cluster_id"))
    }.getOrElse {
      // the empty/absent fallback mirrors the STORED schema: an index
      // built over string doc ids must return string-typed doc_id here
      // too, or callers that union/compare against the populated path
      // hit a type mismatch (ADVICE r6). Only a never-built clusters
      // table falls back to the (long, long) default.
      store.read(t(epoch, "clusters"))
        .map(_.limit(0).select(col("doc_id"), col("cluster_id")))
        .getOrElse {
          val spark = required(epoch, "sig").sparkSession
          import spark.implicits._
          Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id")
        }
    }
  }

  /** Seed the cluster table from the corpus itself: batch-internal
    * near-dup pairs ([[Dedup.minhashLsh]], exact-Jaccard verified) →
    * connected components. Overwrites any previous cluster history OF
    * THIS EPOCH (labels derive from the pair graph, so a re-seed is a
    * rebuild, not an append). */
  def buildClusters(docs: DataFrame, idCol: String, textCol: String,
                    threshold: Double = 0.5): Unit = {
    val epoch = requireEpoch()
    val pairs = Dedup.minhashLsh(docs, idCol, textCol, shingleN, k, bands,
        threshold)
      .select(col("id_a"), col("id_b"))
    store.overwrite(t(epoch, "clusters"),
      stamp(Dedup.connectedComponents(pairs), 0L))
  }

  /** Fold one batch's near-dup pairs into the stored clusters and
    * return the appended delta. Pair sources, both parameter-identical
    * to the build: batch-vs-corpus pairs from the stored signatures
    * ([[query]], slot-agreement ≥ `minEst`) and batch-internal pairs
    * re-shingled exactly ([[Dedup.minhashLsh]], Jaccard ≥ `threshold`).
    * MUST run before [[refresh]] indexes the same batch — after it, the
    * batch is corpus and [[query]] would re-score batch-internal pairs
    * by slot agreement, a different (estimator) verdict than the exact
    * path. For the same reason, ids the index already holds are dropped
    * from the batch here exactly as [[refresh]] drops them: their pairs
    * were folded in when they were ingested, and re-deriving them from
    * a replayed batch would swap exact verdicts for estimator ones —
    * so a FULLY replayed batch contributes nothing at all, a partially
    * replayed one (clusters appended, index append lost) re-appends an
    * identical delta, and either way last-wins readers are unchanged. */
  def refreshClusters(batch: DataFrame, idCol: String, textCol: String,
                      threshold: Double = 0.5,
                      minEst: Double = 0.5): DataFrame = {
    val epoch = requireEpoch()
    val fresh = batch
      .join(required(epoch, "bands").select(col("doc_id").as(idCol)).distinct(),
        Seq(idCol), "left_anti")
      .localCheckpoint(eager = true)
    val cross = query(fresh, idCol, textCol, minEst)
      .select(col("new_id").as("id_a"), col("corpus_id").as("id_b"))
    val internal = Dedup.minhashLsh(fresh, idCol, textCol, shingleN, k,
        bands, threshold)
      .select(col("id_a"), col("id_b"))
    val delta = Dedup.mergeClustersDelta(clusters(), cross.union(internal))
    if (!delta.isEmpty)
      store.append(t(epoch, "clusters"), stamp(delta, nextClusterSeq(epoch)))
    delta
  }

  /** [[refreshClusters]] with EXACT cross verification — the variant a
    * maintained corpus card needs to stay hash-pinnable against
    * from-scratch oracles. The estimator path ([[query]]'s
    * slot-agreement) never touches corpus text but can disagree with
    * exact Jaccard on borderline pairs; here the banded candidate set
    * (batch bands ⋈ stored bands — the identical collision set a
    * from-scratch LSH over the union corpus produces, because the
    * minhash functions are deterministic across batches) is verified
    * by re-shingling ONLY the candidate corpus docs, fetched from
    * `corpusText` by id. Cost: O(batch + candidates) — one
    * candidate-bounded text fetch buys pair-set equality with
    * [[Dedup.minhashLsh]] over the whole corpus, so incremental
    * clusters ≡ from-scratch clusters value-exactly, not just
    * approximately. Same replay discipline as [[refreshClusters]]
    * (already-indexed ids dropped). */
  def refreshClustersExact(batch: DataFrame, idCol: String, textCol: String,
                           corpusText: DataFrame,
                           threshold: Double = 0.5): DataFrame = {
    val epoch = requireEpoch()
    val fresh = batch
      .join(required(epoch, "bands").select(col("doc_id").as(idCol)).distinct(),
        Seq(idCol), "left_anti")
      .localCheckpoint(eager = true)
    val sh = Dedup.shingleRows(fresh, idCol, textCol, shingleN)
      .localCheckpoint(eager = true)
    val bb = Dedup.lshBands(Dedup.minhashSignatures(sh, k), bands, k / bands)
      .localCheckpoint(eager = true)
    val cand = bb.select(col("band"), col("band_key"), col("doc_id").as("id_a"))
      .join(required(epoch, "bands")
          .select(col("band"), col("band_key"), col("doc_id").as("id_b")),
        Seq("band", "band_key"))
      .select(col("id_a"), col("id_b")).distinct()
      .localCheckpoint(eager = true)
    val candCorpus = corpusText
      .join(cand.select(col("id_b").as("_cid")).distinct(),
        col(idCol) === col("_cid"))
      .select(col(idCol), col(textCol))
    val cross = Dedup.verifyJaccard(
        cand, sh.unionByName(
          Dedup.shingleRows(candCorpus, idCol, textCol, shingleN)),
        threshold)
      .select(col("id_a"), col("id_b"))
    val internal = Dedup.minhashLshFrom(sh, bb, threshold)
      .select(col("id_a"), col("id_b"))
    val delta = Dedup.mergeClustersDelta(clusters(), cross.union(internal))
    if (!delta.isEmpty)
      store.append(t(epoch, "clusters"), stamp(delta, nextClusterSeq(epoch)))
    delta
  }

  /** One-call batch ingest: cluster maintenance first (see
    * [[refreshClusters]] for why the order is load-bearing), then the
    * signature/band index append ([[refresh]]). Retrying a crashed
    * ingest from the top is safe at every interleaving: both halves are
    * idempotent for an unchanged batch. */
  def ingest(batch: DataFrame, idCol: String, textCol: String,
             threshold: Double = 0.5, minEst: Double = 0.5): Unit = {
    refreshClusters(batch, idCol, textCol, threshold, minEst)
    refresh(batch, idCol, textCol)
  }

  /** Streaming form of [[ingest]]: each micro-batch folds into the
    * cluster table and then the signature index, keeping BOTH current
    * with a live crawl. foreachBatch replay safety holds per half:
    * a replayed batch's cluster delta is identical and last-wins
    * (same labels re-appended, readers unchanged), and [[refresh]]
    * anti-joins already-indexed ids. A restart between the halves
    * replays the batch from the top — the exact interleaving
    * [[ingest]]'s order makes safe. */
  def ingestStream(stream: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.5, minEst: Double = 0.5)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          ingest(batch.select(col(idCol), col(textCol)), idCol, textCol,
                 threshold, minEst)
      }
}
