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

  /** Build the index from scratch: train quantizers on `corpus`
    * (id, embedding) with coarse centroids supplied (production trains
    * them offline via [[KMeans]]; q61 shows that path), then encode the
    * whole corpus. Overwrites any previous index generation. */
  def build(corpus: DataFrame, coarse: DataFrame): Unit = {
    val codebooks = Pq.train(corpus, m, subDim, codebookK, trainIters)
    store.overwrite(t("coarse"), coarse.select(col("cid"), col("embedding")))
    store.overwrite(t("codebooks"), codebooks)
    store.overwrite(t("assign"),
      Similarity.ivfAssign(corpus, coarse)
        .select(col("id").as("vec_id"), col("cid").as("cell")))
    store.overwrite(t("codes"),
      Pq.encode(corpus, codebooks, m, subDim)
        .withColumnRenamed("id", "vec_id"))
  }

  /** Incremental maintenance: assign + encode ONLY `newVectors`
    * (id, embedding) against the frozen quantizers and append — ingest
    * cost is O(new vectors), independent of index size. */
  def refresh(newVectors: DataFrame): Unit = {
    val coarse = store.read(t("coarse")).getOrElse(
      throw new IllegalStateException(s"index '$name' not built"))
      .select(col("cid"), col("embedding"))
    val codebooks = store.read(t("codebooks")).get
    store.append(t("assign"),
      Similarity.ivfAssign(newVectors, coarse)
        .select(col("id").as("vec_id"), col("cid").as("cell")))
    store.append(t("codes"),
      Pq.encode(newVectors, codebooks, m, subDim)
        .withColumnRenamed("id", "vec_id"))
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
      .filter(!_.isEmpty)
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
    import graft.functions.VectorFunctions.{dot, norm}
    import org.apache.spark.sql.expressions.Window
    val coarse = store.read(t("coarse")).getOrElse(
      throw new IllegalStateException(s"index '$name' not built"))
    val codebooks = store.read(t("codebooks")).get
    val assignment = store.read(t("assign")).get
    val codes = store.read(t("codes")).get
    val c = coarse.select(col("cid").as("cell"),
      col("embedding").as("cent_emb"), norm(col("embedding")).as("cent_norm"))
    val q = queries.select(col("id").as("query_id"),
      col("embedding").as("q_emb"), norm(col("embedding")).as("q_norm"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("cent_sim").desc, col("cell"))
    val probes = q.crossJoin(broadcast(c))
      .select(col("query_id"), col("cell"),
        (dot(col("q_emb"), col("cent_emb")) / (col("q_norm") * col("cent_norm")))
          .as("cent_sim"))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("cell"))
    val lut = Pq.lut(queries, codebooks, m, subDim)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_q").desc, col("vec_id"))
    assignment.join(broadcast(probes), Seq("cell"))
      .join(codes, Seq("vec_id"))
      .filter(col("vec_id") =!= col("query_id"))
      // at-least-once ingest (refreshStream replay) can leave IDENTICAL
      // duplicate assignment/code rows; collapse them here — after the
      // probe join, so the distinct is candidate-sized, never
      // corpus-sized — or the ADC sum below would double-count
      .select(col("query_id"), col("cell"), col("vec_id"), col("m"),
        col("cid"))
      .distinct()
      .join(broadcast(lut), Seq("query_id", "m", "cid"))
      .groupBy(col("query_id"), col("vec_id"), col("cell"))
      .agg(sum(col("qd")).as("adc_q"))
      .select(col("query_id"), col("vec_id"), col("cell"), col("adc_q"),
        (col("adc_q").cast("double") / 1e12).as("adc_hat"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
