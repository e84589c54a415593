package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Idempotence of the hygiene pass: clean(clean(x)) == clean(x) for
  * adversarial inputs drawn from the characters the repair tables
  * actually touch. This is the property that lets a pipeline re-run
  * normalization on already-clean data (checkpoint replays, mixed
  * old/new snapshots) without drift — and it is NOT automatic: a
  * mojibake rule whose OUTPUT re-enters another rule's input alphabet
  * would oscillate. The table is constructed so outputs leave the
  * garble alphabet (repaired chars fold to ASCII or to non-matching
  * letters); this spec is the proof against regressions. */
class NormalizePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // the adversarial alphabet: garble fragments, fold targets,
  // combining marks, controls, plain ASCII
  private val tricky: Seq[String] =
    TextNormalize.MojibakeTable.flatMap(p => Seq(p._1, p._2)) ++
      TextNormalize.PunctFoldTable.flatMap(p => Seq(p._1, p._2)) ++
      Seq("\u0301", "\u0300", "e", "a", " ", "x", "\t", "\n",
          "\u0007", "\u009d", "\u00a0", "Ã", "â", "€", "™")

  private def genString: Gen[String] = for {
    n <- Gen.chooseNum(0, 24)
    parts <- Gen.listOfN(n, Gen.oneOf(tricky))
  } yield parts.mkString

  test("cleanText is idempotent on adversarial garble-alphabet strings") {
    val inputs = (1 to 400).flatMap(_ => genString.sample)
    val df = inputs.toDF("t")
      .select(col("t"), TextNormalize.cleanText(col("t")).as("c1"))
      .select(col("t"), col("c1"),
        TextNormalize.cleanText(col("c1")).as("c2"))
    val bad = df.filter(col("c1") =!= col("c2"))
      .collect()
    assert(bad.isEmpty, bad.take(3).map(r =>
      s"in=${r.getString(0)} c1=${r.getString(1)} c2=${r.getString(2)}")
      .mkString("; "))
  }

  test("clean output contains no controls, no garble, no curly punct") {
    val inputs = (1 to 200).flatMap(_ => genString.sample)
    val out = inputs.toDF("t")
      .select(TextNormalize.cleanText(col("t")).as("c"))
      .collect().map(_.getString(0))
    val forbidden =
      TextNormalize.MojibakeTable.map(_._1) ++
        TextNormalize.PunctFoldTable.map(_._1)
    out.foreach { s =>
      assert(!s.exists(c => (c < ' ' && c != '\t' && c != '\n' && c != '\r')
        || (c >= '\u0080' && c <= '\u009f') || c == '\u007f'), s"controls survive in: $s")
      forbidden.foreach(f =>
        assert(!s.contains(f), s"'$f' survives in: $s"))
    }
  }
}
