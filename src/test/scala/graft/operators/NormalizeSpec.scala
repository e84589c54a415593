package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Encoding repair + NFC: the repair classes the q152 oracle pins at
  * corpus scale, exercised here on adversarial micro-inputs (step
  * ordering, prefix-overlap in the mojibake table, codegen parity of
  * the native NfcNormalize expression). */
class NormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def clean(s: String): String =
    Seq(s).toDF("t").select(TextNormalize.cleanText(col("t")).as("c"))
      .collect().head.getString(0)

  test("mojibake repair covers every table entry, longest-first") {
    // the 3-char sequences share the 2-char prefix "\u00e2\u20ac" - a
    // shorter rule firing first would corrupt the longer ones
    assert(clean("\u00c3\u00a9t\u00c3\u00a9") == "\u00e9t\u00e9") // ete
    assert(clean("\u00e2\u20ac\u2122s") == "'s") // right single quote
    assert(clean("a \u00e2\u20ac\u201cb\u00e2\u20ac\u201d c") == "a -b- c") // en/em dash
    assert(clean("x\u00e2\u20ac\u00a6") == "x...") // ellipsis
    assert(clean("\u00e2\u20ac\u0153q\u00e2\u20ac\u009d") == "\"q\"") // curly double quotes
  }

  test("NFD input composes to NFC and survives identically in codegen") {
    val nfd = "e\u0301tage cafe\u0301" // e + combining acute
    val nfc = "\u00e9tage caf\u00e9"
    assert(clean(nfd) == nfc)
    // many rows -> whole-stage codegen path (not the interpreted
    // fallback a single-row eval can take); values must agree
    val out = (1 to 100).map(i => s"$i $nfd").toDF("t")
      .select(TextNormalize.nfc(col("t")).as("c"))
      .collect().map(_.getString(0))
    assert(out.forall(_.endsWith(nfc)))
  }

  test("controls stripped, tab/newline kept, NBSP folded to space") {
    assert(clean("a\u0007b\u0000c") == "abc")
    assert(clean("a\tb\nc") == "a\tb\nc")
    assert(clean("a\u00a0b") == "a b")
    // C1 range (0x80-0x9f) goes too: a raw 0x9d that is NOT part of a
    // mojibake sequence must not survive
    assert(clean("a\u009db") == "ab")
  }

  test("already-clean ASCII is a fixed point") {
    val s = "plain ascii text, nothing to fix."
    assert(clean(s) == s)
  }
}
