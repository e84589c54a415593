package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Boilerplate-span detection — the repetition-removal pass (C4-style
  * "drop text repeated across many pages") expressed over token n-grams:
  * an n-gram that appears in ≥ `minDf` distinct documents is boilerplate,
  * and every document reports how much of it is covered by such spans
  * (the curation filter then drops docs above a coverage cut, or strips
  * the spans).
  *
  * Scale design (100 TB):
  *  - positional n-grams are a map-only explode off the staged token
  *    array (split runs once per doc — the NOTES.md O(n²) trap);
  *  - the document-frequency aggregate is a two-level groupBy on the
  *    shingle hash, all map-side combinable; the boilerplate set (the
  *    frequent tail) is small by construction, so the span-membership
  *    join broadcasts;
  *  - covered-token counting dedups (doc, position) pairs — spans
  *    overlap — with one distinct + count per doc, shuffled on doc_id.
  * The exploded span table is consumed by two branches (df aggregate +
  * membership join), so it is persisted for the call and dropped after
  * the (per-doc sized) result materializes.
  */
object Boilerplate {

  /** Per-doc boilerplate coverage. Output: (doc_id, n_tokens,
    * n_bp_spans, n_covered, coverage ∈ [0,1]). */
  def spanCoverage(docs: DataFrame, idCol: String, textCol: String,
                   n: Int, minDf: Long): DataFrame = {
    // persisted: TWO consumers (the span explode and the per-doc
    // n_tokens branch) — unpersisted, each re-runs the tokenize regex
    // over the full corpus (a whole extra scan+split pass, VERDICT r8)
    val base = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("_toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val spans = base
      .select(col("doc_id"), col("_toks"),
        explode(transform(
          // short-doc guard is load-bearing: sequence(1, 0) is the
          // DESCENDING [1, 0], not empty — unguarded, any doc with
          // < n tokens evaluates element_at past the array end (a
          // runtime error); null positions → explode emits no rows
          when(size(col("_toks")) >= n,
            sequence(lit(1), size(col("_toks")) - (n - 1))),
          i => struct(i.as("pos"),
            concat_ws(" ", (0 until n).map(k => element_at(col("_toks"), i + k)): _*)
              .as("sh")))).as("sp"))
      .select(col("doc_id"), col("sp.pos").as("pos"), col("sp.sh").as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bp = spans.select(col("doc_id"), col("sh")).distinct()
      .groupBy(col("sh")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDf)
      .select(col("sh"))
    val bpSpans = spans.join(broadcast(bp), Seq("sh"))
    val perDocSpans = bpSpans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bp_spans"))
    val covered = bpSpans
      .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + (n - 1))).as("p"))
      .distinct()
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_covered"))
    val out = base.select(col("doc_id"), size(col("_toks")).cast("long").as("n_tokens"))
      .join(perDocSpans, Seq("doc_id"), "left")
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_bp_spans"), lit(0L)).as("n_bp_spans"),
        coalesce(col("n_covered"), lit(0L)).as("n_covered"),
        // empty docs report coverage 0.0, not the IEEE 0/0 NaN (which
        // engines disagree on and no downstream cut wants)
        when(col("n_tokens") > 0,
          coalesce(col("n_covered"), lit(0L)).cast("double") /
            col("n_tokens").cast("double"))
          .otherwise(lit(0.0)).as("coverage"))
      .localCheckpoint(eager = true) // per-doc sized; then drop the span cache
    spans.unpersist(blocking = false)
    base.unpersist(blocking = false)
    out
  }

  /** Maximal cross-document duplicated spans — the concrete output an
    * exact substring-dedup pass strips (Lee et al., "Deduplicating
    * Training Data Makes Language Models Better", 2022, re-expressed
    * over token n-grams): every maximal run of token positions covered
    * by n-grams appearing in ≥ `minDf` distinct documents, as
    * (doc_id, span_start, span_end) extents a rewrite can cut.
    *
    * Scale design (100 TB):
    *  - positional n-grams are the same map-only explode as
    *    [[spanCoverage]];
    *  - at minDf=2 the duplicated-shingle set is corpus-sized (unlike
    *    the ≥5 boilerplate tail), so membership is a plain shuffle
    *    equi-join on the shingle, NOT a broadcast;
    *  - span merging is a per-document window (lag + running count of
    *    run breaks — gaps-and-islands), shuffled/sorted on doc_id only:
    *    two positions join one span iff they are ≤ n apart, i.e. their
    *    n-token extents overlap or touch.
    */
  def dupSpans(docs: DataFrame, idCol: String, textCol: String,
               n: Int, minDf: Long): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("_toks"))
    val spans = base
      .select(col("doc_id"),
        explode(transform(
          // short-doc guard is load-bearing: sequence(1, 0) is the
          // DESCENDING [1, 0], not empty — unguarded, any doc with
          // < n tokens evaluates element_at past the array end (a
          // runtime error); null positions → explode emits no rows
          when(size(col("_toks")) >= n,
            sequence(lit(1), size(col("_toks")) - (n - 1))),
          i => struct(i.as("pos"),
            concat_ws(" ", (0 until n).map(k => element_at(col("_toks"), i + k)): _*)
              .as("sh")))).as("sp"))
      .select(col("doc_id"), col("sp.pos").as("pos"), col("sp.sh").as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dup = spans.select(col("doc_id"), col("sh")).distinct()
      .groupBy(col("sh")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDf)
      .select(col("sh"))
    val hits = spans.join(dup, Seq("sh"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val out = hits
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(w) <= n, 0L).otherwise(1L))
      .withColumn("grp", sum(col("brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (n - 1)).as("span_end"),
        count(lit(1)).as("n_grams"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1L).as("span_tokens"),
        col("n_grams"))
      .localCheckpoint(eager = true) // span-list sized; then drop the cache
    spans.unpersist(blocking = false)
    out
  }

  /** The rewrite [[dupSpans]] plans: strip every cross-document
    * duplicated span (C4-style "remove text repeated across pages"),
    * reassembling each document from its surviving tokens. Returns
    * (doc_id, clean_text, n_tokens, n_removed).
    *
    * Scale: covered positions are the dup-hit explode (≤ n small rows
    * per hit) deduped on (doc, position); the anti-join and the ordered
    * reassembly both shuffle on doc_id only. The reassembly is the q89
    * collect-sort-join idiom — per-doc arrays, bounded by doc length.
    */
  def stripDupSpans(docs: DataFrame, idCol: String, textCol: String,
                    n: Int, minDf: Long): DataFrame = {
    // persisted: THREE consumers (span explode, posexplode token
    // branch, final n_tokens join) — unpersisted, each re-tokenizes
    // the full corpus (two whole extra scan+split passes, VERDICT r8)
    val base = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("_toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val spans = base
      .select(col("doc_id"),
        explode(transform(
          // short-doc guard is load-bearing: sequence(1, 0) is the
          // DESCENDING [1, 0], not empty — unguarded, any doc with
          // < n tokens evaluates element_at past the array end (a
          // runtime error); null positions → explode emits no rows
          when(size(col("_toks")) >= n,
            sequence(lit(1), size(col("_toks")) - (n - 1))),
          i => struct(i.as("pos"),
            concat_ws(" ", (0 until n).map(k => element_at(col("_toks"), i + k)): _*)
              .as("sh")))).as("sp"))
      .select(col("doc_id"), col("sp.pos").as("pos"), col("sp.sh").as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dup = spans.select(col("doc_id"), col("sh")).distinct()
      .groupBy(col("sh")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDf)
      .select(col("sh"))
    // NOT deduped: anti-join semantics ignore duplicate right rows, so
    // the distinct the coverage COUNT needs (spanCoverage) would be a
    // pure extra shuffle here
    val covered = spans.join(dup, Seq("sh"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("p"))
    val toks = base
      .select(col("doc_id"), size(col("_toks")).cast("long").as("n_tokens"),
        posexplode(col("_toks")).as(Seq("p0", "token")))
      .select(col("doc_id"), col("n_tokens"), (col("p0") + 1).as("p"), col("token"))
    val kept = toks.join(covered, Seq("doc_id", "p"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("p"), col("token")))),
          x => x.getField("token")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
    // left join back so a FULLY duplicated doc still reports (empty text)
    val out = base
      .select(col("doc_id"), size(col("_toks")).cast("long").as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
      .localCheckpoint(eager = true) // per-doc sized; then drop the cache
    spans.unpersist(blocking = false)
    base.unpersist(blocking = false)
    out
  }
}
