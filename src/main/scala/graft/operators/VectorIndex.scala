package graft.operators

import graft.gdl.TableStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persistent IVF+PQ vector index over the lake — the piece that turns
  * the search operators into infrastructure: at 100 TB you do NOT
  * recompute cell assignments and PQ codes per query (the per-query
  * cost must touch only centroids, codes and the probed cells), so the
  * index lives in [[TableStore]] tables and is maintained
  * incrementally.
  *
  * Cross-table snapshot isolation: each build writes a fresh EPOCH of
  * data tables and then flips ONE pointer table —
  *  - `<name>_meta`:           single row (build_epoch) — the pointer;
  *    overwrite is per-table atomic, so the flip is atomic
  *  - `<name>_e<E>_coarse`:    (cid, embedding)    — coarse IVF centroids
  *  - `<name>_e<E>_codebooks`: (m, cid, centroid)  — PQ codebooks
  *  - `<name>_e<E>_assign`:    (vec_id, cell)      — IVF cell per vector
  *  - `<name>_e<E>_codes`:     (vec_id, m, cid)    — PQ code ids per vector
  *
  * A rebuild therefore NEVER mutates the published epoch's tables: a
  * search that resolved the pointer keeps reading one internally
  * consistent quantizer+code generation even while a rebuild writes
  * (or crashes writing) epoch E+1, and a crashed rebuild leaves the
  * old epoch fully published instead of an invalidated index — the
  * mixed-generation race the pre-epoch design documented is closed
  * (VectorIndexSpec races a rebuild against a resolved search). A
  * FIRST build that crashes leaves no pointer → readers fail loudly.
  * Old epochs are retained for in-flight readers; [[vacuumEpochs]]
  * reclaims them once no reader can still hold a stale pointer.
  *
  * [[refresh]] appends assignment/code rows for NEW vectors only (the
  * quantizers stay frozen — the standard IVF discipline: retrain is an
  * offline rebuild, not an ingest-path operation), so ingest cost is
  * O(new vectors) — the same contract as `TableStore.readChangesSince`
  * gives readers. [[search]] runs the composed IVF→ADC plan purely from
  * the stored tables; VectorIndexSpec pins search-from-storage ==
  * search-computed and incremental-refresh == full-rebuild.
  */
final class VectorIndex(store: TableStore, name: String,
                        m: Int, subDim: Int, codebookK: Int,
                        trainIters: Int) {

  private def meta = s"${name}_meta"
  private def t(epoch: Long, suffix: String) = s"${name}_e${epoch}_$suffix"

  /** The published epoch, or None before the first completed build.
    * An EMPTY pointer table is tolerated as unpublished (the shape a
    * pre-epoch layout's crashed rebuild left behind). */
  private def publishedEpoch: Option[Long] =
    store.read(meta).flatMap { df =>
      val rows = df.select(col("build_epoch")).collect()
      rows.headOption.map(_.getLong(0))
    }

  private def requireEpoch(): Long =
    publishedEpoch.getOrElse(throw new IllegalStateException(
      s"index '$name' has no published build — not built, or the first " +
      "build crashed before the pointer commit; rebuild required"))

  /** A required table of one epoch, with a typed "rebuild me" failure
    * instead of a bare None.get when a crashed build left it partial. */
  private def required(epoch: Long, suffix: String): DataFrame =
    store.read(t(epoch, suffix)).getOrElse(throw new IllegalStateException(
      s"index '$name' is missing table '${t(epoch, suffix)}' — a build " +
      "crashed mid-way, or its epoch was vacuumed under a stale pointer; " +
      "rebuild required"))

  /** Build the index from scratch: train quantizers on `corpus`
    * (id, embedding) with coarse centroids supplied (production trains
    * them offline via [[KMeans]]; q61 shows that path), then encode the
    * whole corpus into a NEW epoch's tables, and finally flip the
    * pointer. The previous epoch stays published — and searchable —
    * until the flip; a crash anywhere before it changes nothing for
    * readers. A re-run of a crashed build recomputes the same epoch
    * number (the pointer never advanced) and overwrites its partial
    * tables. */
  def build(corpus: DataFrame, coarse: DataFrame): Unit = {
    import corpus.sparkSession.implicits._
    val epoch = store.history(meta).lastOption.map(_._1 + 1).getOrElse(0L)
    val codebooks = Pq.train(corpus, m, subDim, codebookK, trainIters)
    store.overwrite(t(epoch, "coarse"), coarse.select(col("cid"), col("embedding")))
    store.overwrite(t(epoch, "codebooks"), codebooks)
    // feeds its own table AND the code table's cell column: one pass
    val assign = Similarity.ivfAssign(corpus, coarse)
      .select(col("id").as("vec_id"), col("cid").as("cell"))
      .localCheckpoint(eager = true)
    store.overwrite(t(epoch, "assign"), clusteredByCell(assign))
    store.overwrite(t(epoch, "codes"),
      clusteredByCell(Pq.encode(corpus, codebooks, m, subDim)
        .withColumnRenamed("id", "vec_id")
        .join(assign, Seq("vec_id"))))
    store.overwrite(meta, Seq(epoch).toDF("build_epoch")) // atomic flip
  }

  /** The inverted-list LAYOUT: assignment and code rows range-
    * partitioned and sorted on `cell`, so each part file covers few
    * cells and the store's per-file stats (zone [min,max] + Bloom
    * membership over `cell`) turn a probed-cells scan into opening
    * only those cells' files — [[search]] reads nprobe/ncells of the
    * corpus-sized tables instead of all of them. `vec_id` as the
    * secondary key spreads a big cell over multiple balanced files.
    * Pure physical: contents identical, any reader sees the same rows. */
  private def clusteredByCell(df: DataFrame): DataFrame = {
    // explicit partition count: an unnumbered range shuffle is fair
    // game for AQE coalescing, which on a small input folds everything
    // into ONE file and erases the per-file cell locality the layout
    // exists for. numShufflePartitions is the cluster-sized knob the
    // user already tunes to the data scale.
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartitionByRange(n, col("cell"), col("vec_id"))
      .sortWithinPartitions(col("cell"), col("vec_id"))
  }

  /** Reclaim the space of superseded epochs (tables are emptied and
    * their dead generations gc'd; the tombstone names remain). NOT
    * called from [[build]]: an in-flight reader holding the previous
    * pointer must be able to finish — run this once no search started
    * before the latest build can still be running. */
  def vacuumEpochs(): Unit = {
    val current = requireEpoch()
    for (e <- 0L until current; suffix <- Seq("coarse", "codebooks", "assign", "codes")) {
      store.read(t(e, suffix)).foreach { df =>
        store.overwrite(t(e, suffix), df.limit(0))
        store.gc(t(e, suffix))
      }
    }
  }

  /** Incremental maintenance: assign + encode ONLY `newVectors`
    * (id, embedding) against the frozen quantizers and append — ingest
    * cost is O(new vectors + one vec_id-column scan of the code
    * table). Already-indexed ids are DROPPED, not re-encoded: a
    * re-seen id with a changed embedding would otherwise leave two
    * code rows with different cids whose LUT entries BOTH join the
    * ADC sum (the search-side distinct only collapses identical
    * rows), roughly doubling that vector's score. Re-encoding an
    * existing id is a rebuild, not a refresh. The epoch is resolved
    * ONCE, so both appends land in the same generation even if a
    * rebuild publishes mid-call (the appends then feed a superseded
    * epoch — lost to the new build exactly like any refresh that
    * raced it, which is the rebuild contract: rebuilds re-encode the
    * full corpus). */
  def refresh(newVectors: DataFrame): Unit = {
    val epoch = requireEpoch()
    val coarse = required(epoch, "coarse").select(col("cid"), col("embedding"))
    val codebooks = required(epoch, "codebooks")
    // anti-join on the LAST-appended table (codes): a crash between the
    // assign and codes appends must leave the batch retryable — an
    // anti-join on assign would drop the half-ingested ids on replay
    // and lose their codes forever (search inner-joins codes). The
    // replayed assign rows are identical duplicates, which search's
    // candidate-sized distinct collapses.
    val fresh = newVectors
      .join(required(epoch, "codes").select(col("vec_id").as("id")),
        Seq("id"), "left_anti")
      .localCheckpoint(true) // feeds two encoders: read the feed once
    if (!fresh.isEmpty) {
      val assign = Similarity.ivfAssign(fresh, coarse)
        .select(col("id").as("vec_id"), col("cid").as("cell"))
        .localCheckpoint(eager = true)
      store.append(t(epoch, "assign"), clusteredByCell(assign))
      store.append(t(epoch, "codes"),
        clusteredByCell(Pq.encode(fresh, codebooks, m, subDim)
          .withColumnRenamed("id", "vec_id")
          .join(assign, Seq("vec_id"))))
    }
  }

  /** One step of the incremental-index loop: consume the `sourceTable`
    * change feed past `sinceSeq` (vectors as (id, embedding) rows),
    * index whatever is new, and return the seq to checkpoint for the
    * next poll. The snapshot-first discipline makes the step exactly-
    * once under concurrent appends: rows committed after the snapshot
    * are left for the next poll, never skipped or double-indexed.
    * Propagates the feed's typed failures (an overwritten source needs
    * a rebuild; vacuumed history needs a re-bootstrap). */
  def refreshFrom(sourceTable: String, sinceSeq: Long): Long = {
    val snap = store.history(sourceTable).lastOption.map(_._1)
      .getOrElse(return sinceSeq) // source never written: nothing to do
    if (snap <= sinceSeq) return sinceSeq
    store.readChangesSince(sourceTable, sinceSeq, untilSeq = snap)
      .foreach(df => refresh(df.select(col("id"), col("embedding"))))
    snap
  }

  /** Streaming form of the incremental loop: every micro-batch of
    * (id, embedding) rows is encoded against the frozen quantizers and
    * appended, so a live embedding feed keeps the index current without
    * any rebuild. Caller starts/stops the returned writer (and owns the
    * checkpoint location). Delivery is foreachBatch's at-least-once on
    * restart — a replayed batch re-appends identical assignment/code
    * rows, which [[search]] collapses before scoring (the ADC sum would
    * otherwise double-count), so duplicates cost bytes, never
    * correctness; exactly-once ingest is the [[refreshFrom]]
    * change-feed path. */
  def refreshStream(stream: DataFrame)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) refresh(batch.select(col("id"), col("embedding")))
      }

  /** IVF→ADC search from the stored tables: probes the `nprobe` nearest
    * coarse cells per query, scores ONLY those cells' members via the
    * broadcast lookup table — the corpus-sized inputs touched are the
    * stored assignment and code tables, never the embeddings. The
    * pointer is resolved ONCE, so all four tables come from the same
    * epoch — a rebuild completing mid-search cannot mix quantizer
    * generations into the plan. */
  def search(queries: DataFrame, nprobe: Int, k: Int): DataFrame = {
    val epoch = requireEpoch()
    val coarse = required(epoch, "coarse")
    // Probed-cell file pruning — the inverted-list READ: the probe set
    // comes from Pq.probeCells, the exact function the scorer's
    // candidate join uses, so the cells scanned and the cells scored
    // cannot diverge. Collecting it is centroid-bounded (≤ distinct
    // probed cells ≤ ncells — model-sized, like the coarse broadcast
    // itself); scan() then opens only the files whose zone/Bloom
    // sidecars might hold a probed cell, which under [[clusteredByCell]]
    // is ~nprobe/ncells of each table instead of all of it. Pruning is
    // physical only: scan(pred) ≡ read().filter(pred), and filtering
    // assignment/codes to probed cells drops only rows the probe join
    // discards anyway.
    val cells = Pq.probeCells(queries, coarse, nprobe)
      .select(col("cell")).distinct().collect().map(_.get(0)).toSeq
    val pred = if (cells.isEmpty) lit(false) else col("cell").isin(cells: _*)
    val assign = store.scan(t(epoch, "assign"), pred)
      .getOrElse(required(epoch, "assign"))
    // pre-layout epochs stored codes without the cell column — readable
    // forever, just without code-side pruning; cell is dropped either
    // way (the scorer joins codes on vec_id alone). Pruning is gated on
    // the column existing in EVERY generation: a mixed table (old
    // generations null-filled by unionByName) would lose pre-layout
    // rows to `cell IN (...)` — those nulls fail the IN and their
    // vectors vanish from the inner-joined scorer (ADVICE r6).
    val codesTable = t(epoch, "codes")
    val codes0 = required(epoch, "codes")
    val codes =
      if (codes0.columns.contains("cell") &&
          store.columnInAllGenerations(codesTable, "cell"))
        store.scan(codesTable, pred).map(_.drop("cell"))
          .getOrElse(codes0.drop("cell"))
      else if (codes0.columns.contains("cell")) codes0.drop("cell")
      else codes0
    // the ONE scorer, shared with Pq.ivfPqTopK, over the stored tables:
    // probe selection and tie-breaks cannot diverge between the
    // computed and stored paths. dedupCandidates collapses IDENTICAL
    // duplicate assignment/code rows (at-least-once refreshStream
    // replay) after the probe join — candidate-sized, never
    // corpus-sized — or the ADC sum would double-count.
    Pq.ivfPqScore(queries, coarse, required(epoch, "codebooks"),
      assign, codes, nprobe, m, subDim, k, dedupCandidates = true)
  }
}
