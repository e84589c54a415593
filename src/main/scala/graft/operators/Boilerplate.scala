package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
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
    val base = docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("_toks"))
    val spans = base
      .select(col("doc_id"), col("_toks"),
        explode(transform(
          sequence(lit(1), greatest(size(col("_toks")) - (n - 1), lit(0))),
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
        (coalesce(col("n_covered"), lit(0L)).cast("double") /
          col("n_tokens").cast("double")).as("coverage"))
      .localCheckpoint(eager = true) // per-doc sized; then drop the span cache
    spans.unpersist(blocking = false)
    out
  }
}
