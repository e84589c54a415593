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
  * Tables written by [[build]]:
  *  - `<name>_coarse`:    (cid, embedding)       — coarse IVF centroids
  *  - `<name>_codebooks`: (m, cid, centroid)     — PQ codebooks
  *  - `<name>_assign`:    (vec_id, cell)         — IVF cell per vector
  *  - `<name>_codes`:     (vec_id, m, cid)       — PQ code ids per vector
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

  private def t(suffix: String) = s"${name}_$suffix"

  /** A required table, with a typed "rebuild me" failure instead of a
    * bare None.get when a crashed build left the index partial. */
  private def required(suffix: String): DataFrame =
    store.read(t(suffix)).getOrElse(throw new IllegalStateException(
      s"index '$name' is missing table '${t(suffix)}' — not built, or a " +
      "build crashed mid-way; rebuild required"))

  /** Build the index from scratch: train quantizers on `corpus`
    * (id, embedding) with coarse centroids supplied (production trains
    * them offline via [[KMeans]]; q61 shows that path), then encode the
    * whole corpus. Overwrites any previous index generation.
    *
    * The four tables commit separately (TableStore is per-table
    * atomic); the `meta` marker commits LAST, so a build that crashes
    * mid-way leaves the marker ABSENT (or stale-epoch) and readers
    * fail loudly instead of joining new quantizers to old codes —
    * well-formed garbage scores otherwise. A search running
    * CONCURRENTLY with a rebuild can still see mixed generations
    * (cross-table snapshot isolation needs a top-level pointer commit);
    * rebuilds should be fenced from queries operationally. */
  def build(corpus: DataFrame, coarse: DataFrame): Unit = {
    import corpus.sparkSession.implicits._
    val epoch = store.history(t("meta")).lastOption.map(_._1 + 1).getOrElse(0L)
    // invalidate FIRST: a REBUILD that crashes mid-way must leave
    // readers failing loudly — keeping the previous generation's marker
    // valid while the data tables are half-overwritten would serve new
    // quantizers against old codes (exactly what the marker exists to
    // prevent)
    store.overwrite(t("meta"), Seq.empty[Long].toDF("build_epoch"))
    val codebooks = Pq.train(corpus, m, subDim, codebookK, trainIters)
    store.overwrite(t("coarse"), coarse.select(col("cid"), col("embedding")))
    store.overwrite(t("codebooks"), codebooks)
    store.overwrite(t("assign"),
      Similarity.ivfAssign(corpus, coarse)
        .select(col("id").as("vec_id"), col("cid").as("cell")))
    store.overwrite(t("codes"),
      Pq.encode(corpus, codebooks, m, subDim)
        .withColumnRenamed("id", "vec_id"))
    store.overwrite(t("meta"), Seq(epoch).toDF("build_epoch"))
  }

  /** Marker must be present AND non-empty: an empty marker table is a
    * build/rebuild in flight (build invalidates it first). */
  private def requireComplete(): Unit =
    if (!store.read(t("meta")).exists(df => !df.isEmpty))
      throw new IllegalStateException(
        s"index '$name' has no build-complete marker — not built, or a " +
        "build crashed before finishing; rebuild required")

  /** Incremental maintenance: assign + encode ONLY `newVectors`
    * (id, embedding) against the frozen quantizers and append — ingest
    * cost is O(new vectors + one vec_id-column scan of the code
    * table). Already-indexed ids are DROPPED, not re-encoded: a
    * re-seen id with a changed embedding would otherwise leave two
    * code rows with different cids whose LUT entries BOTH join the
    * ADC sum (the search-side distinct only collapses identical
    * rows), roughly doubling that vector's score. Re-encoding an
    * existing id is a rebuild, not a refresh. */
  def refresh(newVectors: DataFrame): Unit = {
    requireComplete()
    val coarse = required("coarse").select(col("cid"), col("embedding"))
    val codebooks = required("codebooks")
    // anti-join on the LAST-appended table (codes): a crash between the
    // assign and codes appends must leave the batch retryable — an
    // anti-join on assign would drop the half-ingested ids on replay
    // and lose their codes forever (search inner-joins codes). The
    // replayed assign rows are identical duplicates, which search's
    // candidate-sized distinct collapses.
    val fresh = newVectors
      .join(required("codes").select(col("vec_id").as("id")),
        Seq("id"), "left_anti")
      .localCheckpoint(true) // feeds two encoders: read the feed once
    if (!fresh.isEmpty) {
      store.append(t("assign"),
        Similarity.ivfAssign(fresh, coarse)
          .select(col("id").as("vec_id"), col("cid").as("cell")))
      store.append(t("codes"),
        Pq.encode(fresh, codebooks, m, subDim)
          .withColumnRenamed("id", "vec_id"))
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
    * stored assignment and code tables, never the embeddings. */
  def search(queries: DataFrame, nprobe: Int, k: Int): DataFrame = {
    requireComplete()
    // the ONE scorer, shared with Pq.ivfPqTopK, over the stored tables:
    // probe selection and tie-breaks cannot diverge between the
    // computed and stored paths. dedupCandidates collapses IDENTICAL
    // duplicate assignment/code rows (at-least-once refreshStream
    // replay) after the probe join — candidate-sized, never
    // corpus-sized — or the ADC sum would double-count.
    Pq.ivfPqScore(queries, required("coarse"), required("codebooks"),
      required("assign"), required("codes"),
      nprobe, m, subDim, k, dedupCandidates = true)
  }
}
