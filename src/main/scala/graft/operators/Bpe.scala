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

  /** Merge every position whose (sym, nxt) equals the round's pair
    * (`a`, `b`) into `withNext` (word, wc, pos, sym, nxt): greedy
    * leftmost non-overlapping selection, drop the swallowed right
    * symbols, renumber.
    *
    * WINDOW-ONLY rewrite of the original join-based form (guide §2.4 —
    * remove shuffles outright): the old shape materialized the
    * candidate rows as a separate relation and joined the selection
    * and drop sets back on (word, pos) — two extra joins (each with
    * its own exchange when not broadcast) per merge round. Everything
    * here is derivable inside ONE hash-clustering by `word`:
    *  - `_rn` = running candidate count, so `pos - _rn` is constant
    *    exactly on a maximal run of consecutive candidates (the
    *    original's `pos - row_number()` trick, computed in place);
    *  - `_rr` = candidate ordinal inside its run — select the even
    *    offsets (greedy leftmost non-overlapping, a run of k identical
    *    symbols merges ⌊k/2⌋ times, value-identical to the join form);
    *  - positions are contiguous 1..n inside a word, so "swallowed by
    *    the selected candidate to my left" is just lag(_sel).
    * The (word, _grp) window needs no exchange: hashpartitioning(word)
    * already clusters it (partition keys ⊆ clustering keys), only an
    * extra in-partition sort. A non-candidate row can share `_grp`
    * with an adjacent run, but `_rr` counts candidates only and `_sel`
    * is evaluated only on candidates, so the collision is harmless. */
  private def applySelectedWindowed(withNext: DataFrame,
                                    a: String, b: String): DataFrame = {
    val cum = wWord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val d1 = withNext
      .withColumn("_c",
        coalesce(col("sym") === lit(a) && col("nxt") === lit(b), lit(false)))
      .withColumn("_rn", sum(when(col("_c"), 1).otherwise(0)).over(cum))
    val wRun = Window.partitionBy(col("word"), col("_grp")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val d2 = d1.withColumn("_grp", col("pos") - col("_rn"))
      .withColumn("_rr", sum(when(col("_c"), 1).otherwise(0)).over(wRun))
    val d3 = d2
      .withColumn("_sel", col("_c") && (col("_rr") - 1) % 2 === 0)
      .withColumn("_drop", coalesce(lag(col("_sel"), 1).over(wWord), lit(false)))
    d3.filter(!col("_drop"))
      .select(col("word"), col("wc"), col("pos"),
        when(col("_sel"), concat(col("sym"), col("nxt")))
          .otherwise(col("sym")).as("sym"))
      .withColumn("pos", row_number().over(wWord))
  }

  /** Run `nMerges` training rounds from the initial symbol table
    * `syms0` (word, wc, pos, sym). Returns (merge rows, final symbol
    * table) — the final table IS the result of applying the learned
    * merges back to the training vocabulary (replay reproduces it
    * exactly, which the apply-path oracle exploits).
    *
    * Round machinery (r15 optimization, guide §1.2/§2.4): each round's
    * winning pair is an argmax over the pair-count aggregate — ONE row,
    * a model-sized driver value exactly like [[LogReg]]'s per-round
    * gradient — so it is collect()ed and spliced back as literals
    * instead of localCheckpoint + broadcast join (that shape cost two
    * extra jobs and a broadcast exchange per round). The evolving
    * symbol table is persist()ed per round rather than
    * localCheckpoint'd: an InMemoryRelation KEEPS its child's
    * hashpartitioning(word), so every window in every later round runs
    * exchange-free, where the checkpointed ExistingRDD forgot the
    * partitioning and re-shuffled each round (per-query shuffle-byte
    * deltas in OPTIMIZATION_r15.md). */
  private def trainCore(syms0: DataFrame, nMerges: Int): (DataFrame, DataFrame) = {
    val spark = syms0.sparkSession
    import spark.implicits._
    var syms = syms0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val caches = scala.collection.mutable.ArrayBuffer(syms)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= nMerges && !exhausted) {
      val withNext = syms.withColumn("nxt", lead(col("sym"), 1).over(wWord))
      val best = withNext.filter(col("nxt").isNotNull)
        .groupBy(col("sym").as("a"), col("nxt").as("b"))
        .agg(sum(col("wc")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (best.isEmpty) {
        // no adjacent pairs anywhere (e.g. all words single-symbol):
        // the original per-round plan emitted no merge row and left the
        // table unchanged — every later round is then also empty
        exhausted = true
      } else {
        val row = best(0)
        val (a, b, cnt) = (row.getString(0), row.getString(1), row.getLong(2))
        merges += ((r.toLong, a, b, cnt))
        syms = applySelectedWindowed(withNext, a, b)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        caches += syms
      }
      r += 1
    }
    // materialize the end state, then release the per-round caches —
    // without this a long-lived session keeps every round's blocks
    val fin = syms.localCheckpoint(eager = true)
    caches.foreach(_.unpersist(blocking = false))
    val mergeDf = merges.toSeq.toDF("round", "sym_a", "sym_b", "pair_count")
    (mergeDf, fin)
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
    byteSymsFromVocab(docs
      .select(explode(pretokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wc")))

  /** [[byteSyms0]]'s byte-splitting tail over an already-aggregated
    * (word, wc) vocabulary — split out (r16) so callers that stage the
    * corpus's pretoken occurrences once can derive the vocabulary from
    * the staged rows instead of re-running the pretokenizer regex. */
  private def byteSymsFromVocab(vocab: DataFrame): DataFrame =
    vocab
      .select(col("word"), col("wc"), hex(encode(col("word"), "UTF-8")).as("hx"))
      .select(col("word"), col("wc"),
        posexplode(transform(
          sequence(lit(1), (length(col("hx")) / lit(2)).cast("int")),
          i => col("hx").substr(i * 2 - 1, lit(2)))).as(Seq("p0", "sym")))
      .select(col("word"), col("wc"), (col("p0") + 1).as("pos"), col("sym"))

  // r16 measured-and-REVERTED (kept as a negative result, the r15
  // discipline): staging the corpus's exploded pretoken occurrences
  // behind a materialization so the vocabulary aggregation and the
  // per-doc counting scan share ONE pretokenizer regex pass. Both
  // variants regressed at sf0.1 against in-window controls — eager
  // localCheckpoint +11–14% (q171/q224, the extra materialization
  // job), lazy persist +10–14% (q171/q217, cache fill+read of the
  // exploded corpus costs more than the regex map pass it saves).
  // The duplicate work here is a MAP pass, not a shuffle — guide
  // §1.2's order says that trade only pays when the recompute is
  // expensive relative to I/O, which at this text size it is not.

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
    // r16 measured-and-kept-as-was: staging the posexploded pretoken
    // rows behind a materialization (so the vocabulary aggregation and
    // the assembly join share ONE regex pass) read +11–25% on q224 at
    // sf0.1 in both eager-checkpoint cuts — the materialization job
    // costs more than the saved regex pass here, and the tape
    // consumers' prefix is already deduplicated through the id-stream
    // window's exchange (the r15 packIdTape lesson). Two lazy regex
    // passes stay.
    val pre = docs
      .select(col(idCol).as("doc_id"),
        posexplode(pretokens(col(textCol))).as(Seq("w_idx", "word")))
    val fin = applyCore(byteSymsFromVocab(
      pre.groupBy(col("word")).agg(count(lit(1)).as("wc"))), merges)
    val pieceArr = fin.groupBy(col("word"))
      .agg(array_sort(collect_list(struct(col("pos"), col("sym"))))
        .as("ps"))
      .select(col("word"),
        transform(col("ps"), p => p.getField("sym")).as("syms"),
        size(col("ps")).cast("long").as("np"))
    val vocab = vocabIds(merges).toDF("sym", "vid")
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("w_idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    pre
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
    * corpus yields exactly the training-end state.
    *
    * The replay needs NO per-round action (the pairs are known), so
    * the rounds chain lazily into one plan: a single exchange clusters
    * the vocabulary by `word` and every round after that is in-
    * partition window work ([[applySelectedWindowed]]) — versus the
    * old shape's per-round eager localCheckpoint (a job each) plus two
    * joins. A localCheckpoint every `CheckpointEvery` rounds bounds
    * plan depth for long stored merge tables without re-introducing a
    * per-round barrier. */
  private val CheckpointEvery = 16
  private def applyCore(syms0: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    var syms = syms0
    var sinceCheckpoint = 0
    merges.foreach { case (a, b) =>
      val withNext = syms.withColumn("nxt", lead(col("sym"), 1).over(wWord))
      syms = applySelectedWindowed(withNext, a, b)
      sinceCheckpoint += 1
      if (sinceCheckpoint >= CheckpointEvery) {
        syms = syms.localCheckpoint()
        sinceCheckpoint = 0
      }
    }
    val out = syms.select(col("word"), col("wc"),
      col("pos").cast("long").as("pos"), col("sym"))
    // materialize the END state (one job over the whole lazy chain):
    // callers consume the replayed vocabulary more than once (packIdTape
    // reads the id stream up to 4×), and an unmaterialized chain would
    // re-run every round per consumer — measured +60..110% on the tape
    // family when this was dropped in the first r15 cut
    if (sinceCheckpoint > 0) out.localCheckpoint() else out
  }

  /** Tokenize words with a learned merge table: replay the merges in
    * round order against each word's symbol sequence and emit the
    * final (word, pos, sym) pieces. `merges` must be small (it is a
    * vocabulary artifact — thousands of rows at production scale). */
  def applyMerges(docs: DataFrame, textCol: String,
                  merges: Seq[(String, String)]): DataFrame =
    applyCore(charSyms0(docs, textCol), merges)
}
