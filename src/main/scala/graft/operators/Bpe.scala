package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction, distributed: learn the
  * first `nMerges` merge rules from a corpus the way a tokenizer
  * trainer would (count adjacent symbol pairs over the word vocabulary
  * weighted by word frequency, merge the most frequent pair, repeat).
  *
  * Two symbol alphabets share the identical merge machinery:
  *  - [[trainMerges]]/[[applyMerges]]: whitespace words split into
  *    characters (the oracle-friendly classroom form);
  *  - [[trainByteMerges]]/[[byteTokenCounts]]: GPT-2-style —
  *    [[Gpt2PretokenRe]] pre-tokenization (leading-space-attached
  *    pieces, category splits, contraction specials) and BYTE-LEVEL
  *    initial symbols (each pretoken's UTF-8 bytes as hex pairs, so
  *    merges operate on byte sequences and any byte string is
  *    tokenizable — no unknown-symbol escape hatch needed). Real
  *    token budgets are denominated in this family's counts; the
  *    whitespace-vs-BPE count ratio is 1.3–1.7× on web text, so every
  *    budget keyed on whitespace counts is off by that factor.
  *
  * Scale design (100 TB): the corpus is touched ONCE — the
  * word/pretoken-count group-by — and every round after that runs on
  * the aggregated vocabulary table (|vocab| × word-length symbol
  * rows), which is bounded by the language, not the corpus. Pair
  * counting is a map-side-combinable sum; the argmax pair is a 1-row
  * broadcast; per-doc counting joins the corpus once against the
  * broadcast vocabulary piece table.
  *
  * Merge semantics are classic BPE: within each word, ALL
  * non-overlapping occurrences of the best pair merge in one round,
  * leftmost-first (a run of k identical symbols merges ⌊k/2⌋ times).
  * The greedy leftmost selection is computed positionally — a
  * candidate position is selected iff its 0-based index within its
  * consecutive-candidate run is even; runs of length > 1 only occur
  * when sym_a == sym_b — so every step is a window function or an
  * equi-join, value-exact in any engine (no floats anywhere).
  */
object Bpe {

  /** GPT-2's pre-tokenizer pattern (Radford et al. 2019; the published
    * regex), RE2-portable except one deviation: the trailing-
    * whitespace lookahead `\s+(?!\S)` is inexpressible in RE2 (the
    * DuckDB oracle engine), so whitespace runs keep all their spaces
    * in one piece instead of donating the last one to the next token.
    * Single-space text — this corpus's contract — pre-tokenizes
    * identically under both. Alternation order is load-bearing and
    * both Java regex and RE2 resolve it leftmost-first. */
  val Gpt2PretokenRe: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** All pre-tokens of `text` in order (group-0 matches of
    * [[Gpt2PretokenRe]]) — the unit byte-level BPE runs inside. */
  def pretokens(text: Column): Column =
    regexp_extract_all(text, lit(Gpt2PretokenRe), lit(0))

  private val wWord = Window.partitionBy(col("word")).orderBy(col("pos"))

  /** Merge the candidate positions `cand0` (word, pos — every position
    * whose (sym, nxt) equals the round's pair) into `withNext`
    * (word, wc, pos, sym, nxt): greedy leftmost non-overlapping
    * selection, drop the swallowed right symbols, renumber. */
  private def applySelected(withNext: DataFrame, cand0: DataFrame): DataFrame = {
    val cand = cand0.withColumn("rn", row_number().over(wWord))
    val sel = cand
      .withColumn("rr", row_number().over(
        Window.partitionBy(col("word"), col("pos") - col("rn"))
          .orderBy(col("pos"))))
      .filter((col("rr") - 1) % 2 === 0)
      .select(col("word"), col("pos"))
    val drop = sel.select(col("word"), (col("pos") + 1).as("pos"))
    withNext
      .join(sel.withColumn("is_sel", lit(true)), Seq("word", "pos"), "left")
      .join(drop.withColumn("is_drop", lit(true)), Seq("word", "pos"), "left")
      .filter(col("is_drop").isNull)
      .select(col("word"), col("wc"), col("pos"),
        when(col("is_sel"), concat(col("sym"), col("nxt")))
          .otherwise(col("sym")).as("sym"))
      .withColumn("pos", row_number().over(wWord))
  }

  /** Run `nMerges` training rounds from the initial symbol table
    * `syms0` (word, wc, pos, sym). Returns (merge rows, final symbol
    * table) — the final table IS the result of applying the learned
    * merges back to the training vocabulary (replay reproduces it
    * exactly, which the apply-path oracle exploits). */
  private def trainCore(syms0: DataFrame, nMerges: Int): (DataFrame, DataFrame) = {
    var syms = syms0.localCheckpoint() // vocab-sized; feeds every round
    val rounds = (1 to nMerges).map { r =>
      val withNext = syms.withColumn("nxt", lead(col("sym"), 1).over(wWord))
      val best = withNext.filter(col("nxt").isNotNull)
        .groupBy(col("sym").as("a"), col("nxt").as("b"))
        .agg(sum(col("wc")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .localCheckpoint(eager = true) // freeze: the loop mutates syms
      val cand = withNext
        .join(broadcast(best), col("sym") === col("a") && col("nxt") === col("b"))
        .select(col("word"), col("pos"))
      syms = applySelected(withNext, cand).localCheckpoint()
      best.select(lit(r.toLong).as("round"), col("a").as("sym_a"),
        col("b").as("sym_b"), col("cnt").as("pair_count"))
    }
    (rounds.reduce(_ unionByName _), syms)
  }

  /** The learned merge table: (round 1.., sym_a, sym_b, pair_count) —
    * pair_count is the corpus-weighted adjacency count that made this
    * pair win its round. Ties break on (sym_a, sym_b) ascending. */
  def trainMerges(docs: DataFrame, textCol: String, nMerges: Int): DataFrame =
    trainCore(charSyms0(docs, textCol), nMerges)._1

  /** Whitespace-word vocabulary split into single characters. */
  private def charSyms0(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
      .select(col("word"), col("wc"),
        posexplode(transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1)))).as(Seq("p0", "sym")))
      .select(col("word"), col("wc"), (col("p0") + 1).as("pos"), col("sym"))

  /** GPT-2-style pretoken vocabulary split into UTF-8 BYTES, each
    * byte spelled as its 2-hex-digit pair — merges concatenate hex
    * pairs, so every symbol remains a decodable byte string and the
    * construction is exact for any input (non-ASCII included). */
  private def byteSyms0(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(pretokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
      .select(col("word"), col("wc"), hex(encode(col("word"), "UTF-8")).as("hx"))
      .select(col("word"), col("wc"),
        posexplode(transform(
          sequence(lit(1), (length(col("hx")) / lit(2)).cast("int")),
          i => col("hx").substr(i * 2 - 1, lit(2)))).as(Seq("p0", "sym")))
      .select(col("word"), col("wc"), (col("p0") + 1).as("pos"), col("sym"))

  /** Byte-level merge table over the GPT-2 pre-tokenized corpus:
    * (round, sym_a, sym_b, pair_count) with symbols as hex byte
    * strings ("20" = the leading space GPT-2 famously folds into word
    * tokens). */
  def trainByteMerges(docs: DataFrame, textCol: String, nMerges: Int): DataFrame =
    trainCore(byteSyms0(docs, textCol), nMerges)._1

  /** Tokenize pretokens with a learned byte-level merge table: replay
    * the merges in round order and emit the final (word, wc, pos, sym)
    * hex-pair pieces. `merges` is a vocabulary artifact (thousands of
    * rows at production scale) — driver-resident by design. */
  def applyByteMerges(docs: DataFrame, textCol: String,
                      merges: Seq[(String, String)]): DataFrame =
    applyCore(byteSyms0(docs, textCol), merges)

  /** Per-document token counts under an `nMerges` byte-level BPE
    * vocabulary trained on the SAME corpus — the tokenizer-accurate
    * denominator for budget/mix queries (q171 re-bases q68 on it).
    * Training end state == merges applied to the training vocabulary,
    * so the piece table falls out of training for free; the corpus is
    * then scanned once more, each pretoken joined against the
    * broadcast piece table. Output: (doc_id, n_bpe_tokens) — empty
    * docs report 0. */
  def byteTokenCounts(docs: DataFrame, idCol: String, textCol: String,
                      nMerges: Int): DataFrame =
    countsFromPieces(docs, idCol, textCol,
      trainCore(byteSyms0(docs, textCol), nMerges)._2)

  /** [[byteTokenCounts]] from a STORED merge table instead of a fresh
    * training run ([[ModelStore.loadBpe]]): replay the merges against
    * the corpus vocabulary, then the same broadcast-piece-table count
    * pass — value-identical to training-then-counting on the training
    * corpus (the trainCore replay property), at apply cost. */
  def byteTokenCountsWith(docs: DataFrame, idCol: String, textCol: String,
                          merges: Seq[(String, String)]): DataFrame =
    countsFromPieces(docs, idCol, textCol,
      applyCore(byteSyms0(docs, textCol), merges))

  private def countsFromPieces(docs: DataFrame, idCol: String,
                               textCol: String, fin: DataFrame): DataFrame = {
    val pieces = fin.groupBy(col("word"))
      .agg(max(col("pos")).cast("long").as("n_pieces"))
    docs.select(col(idCol).as("doc_id"),
        explode_outer(pretokens(col(textCol))).as("word"))
      .join(broadcast(pieces), Seq("word"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(coalesce(col("n_pieces"), lit(0L))).as("n_bpe_tokens"))
  }

  /** The GPT-2-style vocabulary id map a merge table induces: ids
    * 0–255 are the raw bytes (a byte-level tokenizer needs no UNK),
    * and the symbol minted by merge round r gets id 255 + r. Two
    * rounds CAN mint the same symbol string (different pair splits of
    * one concatenation) — the earliest round's id wins, exactly one
    * id per distinct token string. Driver-side: the vocabulary is a
    * model artifact, not data. */
  def vocabIds(merges: Seq[(String, String)]): Seq[(String, Long)] = {
    val m = scala.collection.mutable.LinkedHashMap[String, Long]()
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      val s = a + b
      if (!m.contains(s)) m(s) = 256L + i
    }
    m.toSeq
  }

  /** Per-document TOKEN-ID streams under a learned byte-level merge
    * table — what a trainer actually consumes: (doc_id, tok_idx,
    * token_id) with `tok_idx` the document-global position (pretokens
    * in order, pieces in order inside each pretoken) and `token_id`
    * from [[vocabIds]] (single-byte pieces take their byte value).
    * Lossless by construction: ids → symbols → unhex → UTF-8
    * reconstructs the pretoken concatenation exactly (BpeSpec pins
    * the round-trip, non-ASCII included).
    *
    * Scale shape: replay runs on the VOCABULARY (bounded by the
    * language); per-doc assembly is one broadcast join of the piece
    * table against the corpus scan, a per-doc running-sum window for
    * the offsets (partitioned by doc — no global sort), and a bounded
    * explode. The id map is a merges-sized broadcast. */
  def encodeIds(docs: DataFrame, idCol: String, textCol: String,
                merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val fin = applyCore(byteSyms0(docs, textCol), merges)
    val pieceArr = fin.groupBy(col("word"))
      .agg(array_sort(collect_list(struct(col("pos"), col("sym"))))
        .as("ps"))
      .select(col("word"),
        transform(col("ps"), p => p.getField("sym")).as("syms"),
        size(col("ps")).cast("long").as("np"))
    val vocab = vocabIds(merges).toDF("sym", "vid")
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("w_idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(pretokens(col(textCol))).as(Seq("w_idx", "word")))
      .join(broadcast(pieceArr), Seq("word"))
      .withColumn("base", coalesce(sum(col("np")).over(wDoc), lit(0L)))
      .select(col("doc_id"), col("base"),
        posexplode(col("syms")).as(Seq("p0", "sym")))
      .join(broadcast(vocab), Seq("sym"), "left")
      .select(col("doc_id"),
        (col("base") + col("p0") + 1L).as("tok_idx"),
        // unmerged single-byte pieces carry their byte value
        coalesce(col("vid"), conv(col("sym"), 16, 10).cast("long"))
          .as("token_id"))
  }

  /** Replay `merges` in round order against `syms0`. Same positional
    * machinery as training, so applying a table to its own training
    * corpus yields exactly the training-end state. */
  private def applyCore(syms0: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    var syms = syms0.localCheckpoint() // bound the per-round plan depth
    merges.foreach { case (a, b) =>
      val withNext = syms.withColumn("nxt", lead(col("sym"), 1).over(wWord))
      val cand = withNext
        .filter(col("sym") === lit(a) && col("nxt") === lit(b))
        .select(col("word"), col("pos"))
      syms = applySelected(withNext, cand).localCheckpoint()
    }
    syms.select(col("word"), col("wc"), col("pos").cast("long").as("pos"),
      col("sym"))
  }

  /** Tokenize words with a learned merge table: replay the merges in
    * round order against each word's symbol sequence and emit the
    * final (word, pos, sym) pieces. `merges` must be small (it is a
    * vocabulary artifact — thousands of rows at production scale). */
  def applyMerges(docs: DataFrame, textCol: String,
                  merges: Seq[(String, String)]): DataFrame =
    applyCore(charSyms0(docs, textCol), merges)
}
