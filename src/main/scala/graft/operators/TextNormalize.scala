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
  * repair BEFORE NFC (mojibake is not valid composition), fold
  * punctuation AFTER NFC (so folded quotes cannot re-compose),
  * control-strip last (repair may surface control chars).
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
    // 1. mojibake repair first: garbled sequences are not valid
    //    compositions, NFC would not touch them;
    // 2. NFC second: combining sequences (e + U+0301) compose to é,
    //    including ones the repair just produced;
    // 3. punctuation folding third: operates on composed code points;
    // 4. control strip last: repair/NFC can surface control chars
    //    (the 0x9d in repaired ”-mojibake is consumed by step 1's
    //    mapping, but a stray unpaired one must still go).
    stripControls(foldPunctuation(nfc(repairMojibake(text))))
}
