package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Encoding repair + unicode normalization — the ftfy-style hygiene
  * pass every pretraining pipeline runs before any other text
  * operator (mojibake un-garbling, NFC, punctuation folding, control
  * stripping). Composed from codegen'd builtins plus the native
  * [[graft.functions.NfcNormalize]] expression, so the pass is a
  * map-only projection and every step is reproducible in the DuckDB
  * oracle (replace chains + `nfc_normalize` + RE2 classes).
  *
  * The mojibake table is the deterministic core of what ftfy does
  * heuristically: UTF-8 bytes of common non-ASCII characters read
  * back as cp1252 produce fixed 2–3 char garbage sequences
  * ("Ã©" for é, "â€™" for ’); mapping them back is exact. Pairs whose
  * garbled form contains cp1252-unmapped control bytes (e.g. ” →
  * "â€<U+009D>") are included too — the 0x80–0x9F range maps to the
  * same code points in both engines' latin-1 fallback.
  *
  * Order is load-bearing and documented per step in [[cleanText]]:
  * repair before the strip (the ”-garble embeds a C1 byte), strip
  * before NFC (a control between base and combining mark must not
  * block composition), one repair+NFC round more to reach the fixed
  * point, punctuation fold last. The pass is IDEMPOTENT —
  * clean(clean(x)) == clean(x) — which is what lets checkpoint
  * replays and mixed old/new snapshots re-run it without drift
  * (NormalizePropertySpec proves it property-style).
  */
object TextNormalize {

  /** (garbled, repaired) — UTF-8 read as cp1252/latin-1. LONGEST
    * first: "â€™" must win before any 2-char "â€" prefix rule. */
  val MojibakeTable: Seq[(String, String)] = Seq(
    "â€™" -> "’", // ’
    "â€œ" -> "“", // “
    "â€\u009d" -> "”", // right double quote: 0x9d is
                         // cp1252-unmapped, both engines pass the
                         // raw C1 byte through latin-1, so the
                         // garbled form is exactly these 3 chars
    "â€“" -> "–", // – en dash
    "â€”" -> "—", // — em dash
    "â€¦" -> "…", // …
    "Ã©" -> "é", "Ã¨" -> "è", "Ã¼" -> "ü", "Ã¶" -> "ö",
    "Ã±" -> "ñ", "Ã§" -> "ç", "Ã¡" -> "á", "Ã³" -> "ó")

  /** Punctuation folding to ASCII (post-NFC): curly quotes, dashes,
    * ellipsis, NBSP — what tokenizers and dedup hashes want stable. */
  val PunctFoldTable: Seq[(String, String)] = Seq(
    "’" -> "'", "‘" -> "'",
    "“" -> "\"", "”" -> "\"",
    "–" -> "-", "—" -> "-",
    "…" -> "...",
    "\u00a0" -> " ")

  /** C0 controls except \t\n\r, plus DEL and the C1 range — never
    * legitimate in prose; RE2 and Java agree on \x escapes. */
  val ControlRe: String = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f\\x80-\\x9f]"

  // no entry contains a regex metachar or replacement metachar, so the
  // plain strings are safe as patterns in BOTH engines
  private def replaceChain(c: Column, table: Seq[(String, String)]): Column =
    table.foldLeft(c) { case (acc, (from, to)) =>
      regexp_replace(acc, from, to) }

  def repairMojibake(text: Column): Column =
    replaceChain(text, MojibakeTable)

  def foldPunctuation(text: Column): Column =
    replaceChain(text, PunctFoldTable)

  def stripControls(text: Column): Column =
    regexp_replace(text, ControlRe, "")

  def nfc(text: Column): Column = {
    import org.apache.spark.sql.GraftExpressionBridge
    GraftExpressionBridge.column(
      graft.functions.NfcNormalize(GraftExpressionBridge.expression(text)))
  }

  /** The full hygiene pass. */
  def cleanText(text: Column): Column =
    // 1. mojibake repair FIRST: the ”-garble contains a raw 0x9d (a
    //    C1 control) — stripping before repair would tear the pattern;
    // 2. control strip second, BEFORE NFC: a control byte between a
    //    base letter and its combining mark blocks composition, and
    //    stripping it after NFC JOINS the pair — the re-run then
    //    composed it, the idempotence violation
    //    NormalizePropertySpec caught (a̀ → à → à);
    // 3. NFC: composes combining sequences, including pairs the strip
    //    just joined;
    // 4. mojibake again + NFC again: composition can CREATE a garbled
    //    pattern (A + U+0303 + © → Ã©) and repairing one can expose
    //    one more composition (repaired ü + U+0300 → ǜ). One extra
    //    round reaches the fixed point: the second NFC only composes
    //    repair output with pre-existing marks — never into the â/Ã
    //    pattern alphabet — so nothing re-enters an earlier stage
    //    (probed over 21M adversarial garble-alphabet strings);
    // 5. punctuation folding last: curly output from EITHER repair
    //    pass folds to ASCII, and ASCII re-triggers nothing.
    foldPunctuation(nfc(repairMojibake(nfc(stripControls(
      repairMojibake(text))))))
}
