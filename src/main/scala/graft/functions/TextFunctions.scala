package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data pipeline:
  * tokenization, shingling, quality metrics, language-ID scoring,
  * fingerprinting. All built from codegen'd builtins (no Scala UDFs) so
  * they stay inside whole-stage codegen and are exactly reproducible in
  * the DuckDB oracle.
  */
object TextFunctions {

  /** Whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Distinct word n-gram shingles from a PRE-MATERIALIZED token array.
    * Pass an attribute column (stage `tokens(text)` with a select first):
    * a raw `tokens(text)` expression here would be re-evaluated for every
    * `element_at` in the lambda — O(tokens²) per document. */
  def wordShinglesFromTokens(toks: Column, n: Int): Column =
    // the short-doc guard is load-bearing: sequence(1, 0) is the
    // DESCENDING array [1, 0], not empty, so an unguarded transform
    // would evaluate element_at past the array end — an ANSI runtime
    // error on any document with fewer than n tokens
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(
          sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*))))

  /** Distinct word n-gram shingles (convenience; prefer staging tokens —
    * see [[wordShinglesFromTokens]]). */
  def wordShingles(text: Column, n: Int): Column =
    wordShinglesFromTokens(tokens(text), n)

  /** Distinct character n-gram shingles — [[charNgrams]] deduplicated,
    * so the short-text guard lives in exactly one place. */
  def charShingles(text: Column, n: Int): Column =
    array_distinct(charNgrams(text, n))

  /** ALL character n-grams in order, duplicates kept — the hashed
    * bag-of-ngrams feature primitive ([[graft.operators.LangId]]).
    * Texts shorter than n yield an EMPTY array — without the guard,
    * sequence(1, 0) = [1, 0] and substr's position-0 tolerance would
    * silently emit partial "grams", giving unrelated short docs
    * spurious jaccard 1.0 downstream. */
  def charNgrams(text: Column, n: Int): Column =
    when(length(text) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => substr(text, i, lit(n))))

  /** 16-bit token hash from the md5 hex prefix — shared by SimHash and
    * the LSH band keys; reproducible in any engine with md5. Backed by
    * the native [[Md5PrefixLong]] (value-identical to
    * `conv(substring(md5(token), 1, 4), 16, 10)`, without materializing
    * and re-parsing the 32-char hex string per token — r15, guide §1.2
    * step 2). */
  def hash16(token: Column): Column = {
    import org.apache.spark.sql.GraftExpressionBridge
    GraftExpressionBridge.column(
      Md5PrefixLong(GraftExpressionBridge.expression(token), 4))
  }

  /** Per-token hash array — stage this through a select before feeding
    * [[simhash16FromHashes]] (16 bit-sums reference it; staging keeps
    * the md5s computed once per token, the NOTES.md O(n²) trap). */
  def tokenHashes(text: Column): Column = transform(tokens(text), t => hash16(t))

  /** Map-only per-row SimHash over a PRE-MATERIALIZED hash array —
    * value-identical to [[graft.operators.Dedup.simhash16]]'s
    * explode+groupBy form (same hash16, same ±1 bit sums, integer adds
    * are order-free), but with no aggregation, so it composes with
    * streaming state operators without adding a stateful stage. */
  def simhash16FromHashes(hs: Column): Column =
    (0 until 16).map { b =>
      val bitSum = aggregate(hs, lit(0L), (acc, h) =>
        acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(bitSum > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Production-width (64-bit) SimHash pieces: same construction as the
    * 16-bit oracle-checkable form, widened — token hash from xxhash64
    * (codegen'd builtin; no hex parsing), 64 ±1 bit-sums, sign fuse.
    * The 16-bit form stays because DuckDB-expressible oracles pin ITS
    * values; this one is spec-verified against brute Hamming instead
    * (the construction is identical, only the width changes). */
  def tokenHashes64(text: Column): Column =
    transform(tokens(text), t => xxhash64(t))

  /** Map-only 64-bit SimHash over a pre-materialized hash array. Bit 63
    * lands in the sign — the fingerprint is an opaque signed long. */
  def simhash64FromHashes(hs: Column): Column =
    (0 until 64).map { b =>
      val bitSum = aggregate(hs, lit(0L), (acc, h) =>
        acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(bitSum > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Jaccard similarity of two pre-distinct shingle arrays (single
    * double division → bit-identical across engines). Two empty sets →
    * 0.0 — under Spark's default ANSI mode the unguarded 0/0 raises
    * DIVIDE_BY_ZERO and kills the job. (The intersect appears twice in
    * the tree; top-level projections fold it via subexpression
    * elimination.) */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = (size(a) + size(b)).cast("double") - size(array_intersect(a, b))
    when(union === 0.0, lit(0.0)).otherwise(inter / union)
  }

  /** Exact 64-bit-safe polynomial rolling hash (base 31, mod 1e9+7) over
    * the document's bytes — the document fingerprint. Backed by the
    * native codegen'd [[RollingHash]] expression (O(n) per document; the
    * equivalent higher-order-function fold is O(n²)). */
  def rollingFingerprint(text: Column): Column = {
    import org.apache.spark.sql.GraftExpressionBridge
    GraftExpressionBridge.column(
      RollingHash(GraftExpressionBridge.expression(text), 31L, 1000000007L))
  }

  /** Ratio of tokens found in `words` to all tokens. */
  def listRatio(text: Column, words: Seq[String]): Column = {
    val ts = tokens(text)
    when(size(ts) === 0, lit(0.0)).otherwise(
      size(filter(ts, t => t.isin(words: _*))).cast("double") /
        size(ts).cast("double"))
  }
}
