package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The Gopher/Dolma rule battery (Rae et al. 2021 §A1.1) as a reusable
  * operator: q135 is its batch query surface, and
  * [[graft.streaming.StreamingQualityGate]] applies the same rules per
  * micro-batch with dead-letter routing. One map-only pass; every
  * signal in integer/ppm arithmetic so the booleans are engine-exact
  * (no double-ratio drift). Expressions here are the oracle-pinned
  * source of truth — q135's hash match verifies them.
  */
object QualityRules {

  val stopWords: Seq[String] =
    Seq("the", "a", "of", "to", "and", "in", "is", "that")

  /** Rule columns produced by [[withSignals]], in severity order (the
    * dead-letter reason is the FIRST violated rule in this order). */
  val ruleNames: Seq[String] = Seq("r_word_count", "r_mean_wl", "r_symbol",
    "r_bullet", "r_ellipsis", "r_unique", "r_stop")

  /** Adds signal + rule + `passes` columns to `docs` (original columns
    * retained; intermediates prefixed `_` are dropped). */
  def withSignals(docs: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("_words", split(trim(t), "\\s+"))
      .withColumn("_lw", transform(col("_words"), w => lower(w)))
      .withColumn("_lines", split(t, "\n"))
      .withColumn("n_words", size(col("_words")).cast("long"))
      .withColumn("_word_chars",
        length(regexp_replace(t, "\\s+", "")).cast("long"))
      .withColumn("_n_lines", size(col("_lines")).cast("long"))
      .withColumn("_n_bullet", size(filter(col("_lines"),
        l => substring(trim(l), 1, 1).isin("-", "*", "•"))).cast("long"))
      .withColumn("_n_ell_end", size(filter(col("_lines"),
        l => endswith(trim(l), lit("...")))).cast("long"))
      .withColumn("_n_hash",
        (length(t) - length(regexp_replace(t, "#", ""))).cast("long"))
      .withColumn("_n_ell3", expr(
        s"CAST(length($textCol) - length(regexp_replace($textCol, " +
          "'\\\\.\\\\.\\\\.', '')) AS BIGINT) div 3"))
      .withColumn("n_unique", size(array_distinct(col("_lw"))).cast("long"))
      .withColumn("stop_hits",
        size(array_intersect(col("_lw"),
          array(stopWords.map(lit): _*))).cast("long"))
      .withColumn("mean_wl_x100", expr("_word_chars * 100 div n_words"))
      .withColumn("symbol_ppm",
        expr("(_n_hash + _n_ell3) * 1000000 div n_words"))
      .withColumn("r_word_count", col("n_words").between(50L, 100000L))
      .withColumn("r_mean_wl", col("mean_wl_x100").between(300L, 1000L))
      .withColumn("r_symbol", col("symbol_ppm") < 100000L)
      .withColumn("r_bullet", col("_n_bullet") * 10L <= col("_n_lines") * 9L)
      .withColumn("r_ellipsis",
        col("_n_ell_end") * 10L <= col("_n_lines") * 3L)
      .withColumn("r_unique", col("n_unique") * 5L > col("n_words"))
      .withColumn("r_stop", col("stop_hits") >= 2L)
      .withColumn("passes", ruleNames.map(col).reduce(_ && _))
      .drop("_words", "_lw", "_lines", "_word_chars", "_n_lines",
        "_n_bullet", "_n_ell_end", "_n_hash", "_n_ell3")
  }

  /** Dead-letter rules over [[withSignals]] output: a row quarantines
    * under the first VIOLATED rule. */
  def violations: Seq[(String, Column)] =
    ruleNames.map(r => s"fails_$r" -> !col(r))
}
