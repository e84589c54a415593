package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction, distributed: learn the
  * first `nMerges` merge rules from a corpus the way a tokenizer
  * trainer would (count adjacent symbol pairs over the word vocabulary
  * weighted by word frequency, merge the most frequent pair, repeat).
  *
  * Scale design (100 TB): the corpus is touched ONCE — the word-count
  * group-by — and every Lloyd's-style round after that runs on the
  * aggregated vocabulary table (|vocab| × word-length symbol rows),
  * which is bounded by the language, not the corpus. Pair counting is
  * a map-side-combinable sum; the argmax pair is a 1-row broadcast.
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

  /** The learned merge table: (round 1.., sym_a, sym_b, pair_count) —
    * pair_count is the corpus-weighted adjacency count that made this
    * pair win its round. Ties break on (sym_a, sym_b) ascending. */
  def trainMerges(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val words = docs
      .select(explode(tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
    val wWord = Window.partitionBy(col("word")).orderBy(col("pos"))
    var syms = words
      .select(col("word"), col("wc"),
        posexplode(transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1)))).as(Seq("p0", "sym")))
      .select(col("word"), col("wc"), (col("p0") + 1).as("pos"), col("sym"))
      .localCheckpoint() // vocab-sized; feeds every round
    val rounds = (1 to nMerges).map { r =>
      val withNext = syms.withColumn("nxt", lead(col("sym"), 1).over(wWord))
      val best = withNext.filter(col("nxt").isNotNull)
        .groupBy(col("sym").as("a"), col("nxt").as("b"))
        .agg(sum(col("wc")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .localCheckpoint(eager = true) // freeze: the loop mutates syms
      // greedy leftmost non-overlapping occurrences of (a, b): within a
      // run of consecutive candidate positions, every other one merges
      val cand = withNext
        .join(broadcast(best), col("sym") === col("a") && col("nxt") === col("b"))
        .select(col("word"), col("pos"))
        .withColumn("rn", row_number().over(wWord))
      val sel = cand
        .withColumn("rr", row_number().over(
          Window.partitionBy(col("word"), col("pos") - col("rn"))
            .orderBy(col("pos"))))
        .filter((col("rr") - 1) % 2 === 0)
        .select(col("word"), col("pos"))
      val drop = sel.select(col("word"), (col("pos") + 1).as("pos"))
      syms = withNext
        .join(sel.withColumn("is_sel", lit(true)), Seq("word", "pos"), "left")
        .join(drop.withColumn("is_drop", lit(true)), Seq("word", "pos"), "left")
        .filter(col("is_drop").isNull)
        .select(col("word"), col("wc"), col("pos"),
          when(col("is_sel"), concat(col("sym"), col("nxt")))
            .otherwise(col("sym")).as("sym"))
        .withColumn("pos", row_number().over(wWord))
        .localCheckpoint()
      best.select(lit(r.toLong).as("round"), col("a").as("sym_a"),
        col("b").as("sym_b"), col("cnt").as("pair_count"))
    }
    rounds.reduce(_ unionByName _)
  }

  /** Tokenize words with a learned merge table: replay the merges in
    * round order against each word's symbol sequence and emit the
    * final (word, pos, sym) pieces. Same positional-merge machinery as
    * training, so applying the table to its own training corpus yields
    * exactly the training-end state. `merges` must be small (it is a
    * vocabulary artifact — thousands of rows at production scale). */
  def applyMerges(docs: DataFrame, textCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    val words = docs
      .select(explode(tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
    val wWord = Window.partitionBy(col("word")).orderBy(col("pos"))
    var syms = words
      .select(col("word"), col("wc"),
        posexplode(transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1)))).as(Seq("p0", "sym")))
      .select(col("word"), col("wc"), (col("p0") + 1).as("pos"), col("sym"))
    merges.foreach { case (a, b) =>
      val withNext = syms.withColumn("nxt", lead(col("sym"), 1).over(wWord))
      val cand = withNext
        .filter(col("sym") === lit(a) && col("nxt") === lit(b))
        .select(col("word"), col("pos"))
        .withColumn("rn", row_number().over(wWord))
      val sel = cand
        .withColumn("rr", row_number().over(
          Window.partitionBy(col("word"), col("pos") - col("rn"))
            .orderBy(col("pos"))))
        .filter((col("rr") - 1) % 2 === 0)
        .select(col("word"), col("pos"))
      val drop = sel.select(col("word"), (col("pos") + 1).as("pos"))
      syms = withNext
        .join(sel.withColumn("is_sel", lit(true)), Seq("word", "pos"), "left")
        .join(drop.withColumn("is_drop", lit(true)), Seq("word", "pos"), "left")
        .filter(col("is_drop").isNull)
        .select(col("word"), col("wc"), col("pos"),
          when(col("is_sel"), concat(col("sym"), col("nxt")))
            .otherwise(col("sym")).as("sym"))
        .withColumn("pos", row_number().over(wWord))
    }
    syms.select(col("word"), col("wc"), col("pos").cast("long").as("pos"),
      col("sym"))
  }
}
