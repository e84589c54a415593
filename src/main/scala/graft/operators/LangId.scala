package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained language identification — a fastText-style linear classifier
  * over HASHED character-trigram features, replacing marker-word
  * heuristics (the q20 baseline) with a model fit on the corpus's own
  * labels. Langid keys every multilingual-corpus decision (mixing
  * ratios, per-language quality floors), so it must be a trained,
  * measurable component, not a hand-tuned word list.
  *
  * Construction (all pieces the engine already owns):
  *  - features: every char trigram hashes through the md5-prefix
  *    [[TextFunctions.hash16]] into `buckets` slots (the [[Dsir]]
  *    hashed-feature discipline — model size is fixed no matter how
  *    the vocabulary grows); x_b = bucket count / total trigrams
  *    (exact long counts, ONE double division — engine-bitwise), plus
  *    an x0 = 1 bias;
  *  - training: fused one-vs-rest [[LogReg.trainMulti]] — full-batch
  *    GD where each round is ONE map-side-combinable aggregate covering
  *    EVERY language's gradient (rounds corpus passes total, not
  *    rounds·|langs|) and the model (buckets+1 doubles per language)
  *    lives on the driver;
  *  - prediction: argmax of the per-language quantized sigmoids, with
  *    the same deterministic ≥-chain tie-break as the heuristic.
  *
  * Scale shape (100 TB): the feature table is per-doc sized and
  * localCheckpoint'd ONCE — the `rounds` fused training aggregates and
  * the final scoring pass all read materialized columns instead of
  * re-hashing the corpus; scoring folds the collected weights into the
  * plan as literals (zero joins, map-only). Trigram hashing itself is
  * one staged map pass.
  *
  * Honesty note, pinned by the eval query: on a corpus whose labels
  * carry no n-gram signal (this synthetic one — per-language token
  * distributions are flat), the discriminative model converges to the
  * CLASS PRIOR, which is the Bayes-correct answer and still beats any
  * arbitrary marker list; on a real multilingual corpus the identical
  * machinery learns the true trigram signal. The eval query measures
  * both accuracies rather than asserting either.
  */
object LangId {

  /** Per-doc hashed-trigram feature rows:
    * (doc_id, actual_lang, x0 = 1.0, x1..x{buckets} = bucket ratios).
    *
    * r15 optimization (guide §1.2 step 2, the q228 HOF→native lesson):
    * the bucket counts come from ONE compiled pass
    * ([[graft.functions.TrigramBucketCounts]] — md5 per gram into a
    * histogram) instead of a per-gram string array plus `buckets` ×
    * `size(filter(...))` interpreted scans; the gram total is the
    * histogram's sum, so the old size() pass disappears too. The
    * histogram is staged through its own projection so the buckets+1
    * ratio consumers read one materialized array (the NOTES.md O(n²)
    * re-evaluation trap). Values are bit-identical: exact long counts,
    * same md5-prefix hash, ONE double division per feature. */
  def featurize(docs: DataFrame, idCol: String, textCol: String,
                langCol: String, buckets: Int): DataFrame = {
    import org.apache.spark.sql.GraftExpressionBridge
    val cnts = GraftExpressionBridge.column(
      graft.functions.TrigramBucketCounts(
        GraftExpressionBridge.expression(col(textCol)), 3, buckets))
    val staged = docs.select(col(idCol).as("doc_id"),
      col(langCol).as("actual_lang"), cnts.as("_cnt"))
      .withColumn("_n",
        aggregate(col("_cnt"), lit(0L), (a, x) => a + x).cast("double"))
    staged.select(
      Seq(col("doc_id"), col("actual_lang"), lit(1.0).as("x0")) ++
        (1 to buckets).map(b =>
          // short docs (zero trigrams) get all-zero features; the
          // unguarded 0/0 raises DIVIDE_BY_ZERO under ANSI mode
          when(col("_n") === 0.0, lit(0.0))
            .otherwise(element_at(col("_cnt"), b).cast("double") / col("_n"))
            .as(s"x$b")): _*)
  }

  /** Train one-vs-rest on a featurized corpus: one fused aggregate
    * per round covers every language (rounds corpus passes instead of
    * rounds·|langs|), bitwise equal to per-language LogReg.train —
    * see LogReg.trainMulti. Returns buckets+1 doubles per language. */
  private def trainOn(feats: DataFrame, langs: Seq[String], buckets: Int,
                      lr: Double, rounds: Int): Seq[Seq[Double]] = {
    val dim = buckets + 1
    val xs = (0 until dim).map(j => col(s"x$j"))
    val labeled = feats.select(
      langs.indices.map(k =>
        when(col("actual_lang") === langs(k), 1.0).otherwise(0.0)
          .as(s"y_$k")) ++ xs: _*)
    LogReg.trainMulti(labeled, langs.size, dim, lr, rounds)
  }

  /** Score a featurized corpus with the given weights: the quantized
    * sigmoids per language, argmax with the deterministic ≥-chain
    * tie-break (language ORDER is part of the model). */
  private def scoreFeats(feats: DataFrame, langs: Seq[String],
                         weights: Seq[Seq[Double]],
                         buckets: Int): DataFrame = {
    val xs = (0 until buckets + 1).map(j => col(s"x$j"))
    val scored = feats.select(
      Seq(col("doc_id"), col("actual_lang")) ++
        langs.zip(weights).map { case (l, w) =>
          LogReg.score(w, xs).as(s"s_$l") }: _*)
    val pred = langs.init.foldRight(lit(langs.last)) { case (l, rest) =>
      val ge = langs.filter(_ != l)
        .map(o => col(s"s_$l") >= col(s"s_$o")).reduce(_ && _)
      when(ge, lit(l)).otherwise(rest)
    }
    scored.withColumn("predicted", pred)
      .withColumn("is_match", col("predicted") === col("actual_lang"))
  }

  /** Train and return just the model — the exportable artifact
    * ([[ModelStore.exportLangId]] persists it, [[scoreWith]] replays
    * it). */
  def train(docs: DataFrame, idCol: String, textCol: String,
            langCol: String, langs: Seq[String], buckets: Int = 16,
            lr: Double = 0.5, rounds: Int = 2): Seq[Seq[Double]] = {
    val feats = featurize(docs, idCol, textCol, langCol, buckets)
      .localCheckpoint(eager = true) // read `rounds` times
    trainOn(feats, langs, buckets, lr, rounds)
  }

  /** Score with a STORED model: one featurize pass, zero training
    * aggregates — eval/calibration consumers read the artifact
    * instead of re-fitting it (hash-identical: parquet round-trips
    * the weight doubles bit-exactly). */
  def scoreWith(docs: DataFrame, idCol: String, textCol: String,
                langCol: String, langs: Seq[String],
                weights: Seq[Seq[Double]], buckets: Int = 16): DataFrame =
    scoreFeats(featurize(docs, idCol, textCol, langCol, buckets),
      langs, weights, buckets)

  /** Train one-vs-rest and score the whole corpus (fused: the
    * checkpointed feature table feeds training AND scoring).
    * Output: (doc_id, actual_lang, s_&lt;lang&gt; per language,
    * predicted, is_match). */
  def trainScore(docs: DataFrame, idCol: String, textCol: String,
                 langCol: String, langs: Seq[String], buckets: Int = 16,
                 lr: Double = 0.5, rounds: Int = 2): DataFrame = {
    val feats = featurize(docs, idCol, textCol, langCol, buckets)
      .localCheckpoint(eager = true) // read rounds + 1 times
    scoreFeats(feats, langs, trainOn(feats, langs, buckets, lr, rounds),
      buckets)
  }
}
