package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz for the FULL-RFC wildcard matcher: the engine
  * compiles each rule to an escaped SQL LIKE pattern
  * ([[HostRules.robotsPathMatchRfcCols]]); this spec re-derives the
  * RFC semantics through a completely INDEPENDENT formulation —
  * quoted-literal regex segments joined by greedy `.*`, `lookingAt`
  * for the prefix contract, `matches` when `$`-anchored — and drives
  * both over random rules/paths whose alphabet deliberately includes
  * every character the LIKE compilation must escape (`%`, `_`, `\`)
  * plus stars, anchors and mid-rule dollars. Any escaping slip,
  * anchor slip, or prefix-vs-full-match slip diverges the two. */
class RfcMatchFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Independent reference: RFC 9309 match as greedy regex. */
  private def refMatch(rule: String, path: String): Boolean = {
    if (!rule.startsWith("/")) return false
    val anchored = rule.endsWith("$")
    val core = if (anchored) rule.dropRight(1) else rule
    // split keeps empty literals ("-1") so "/a**b" and trailing stars
    // keep their semantics; quote() makes every literal octet literal
    val rx = core.split("\\*", -1)
      .map(s => if (s.isEmpty) "" else java.util.regex.Pattern.quote(s))
      .mkString(".*")
    val m = java.util.regex.Pattern.compile("(?s)" + rx).matcher(path)
    if (anchored) m.matches() else m.lookingAt()
  }

  test("LIKE-compiled matcher ≡ regex reference over hostile alphabets") {
    import spark.implicits._
    val ruleChars = "/ab1*$_%\\".toCharArray
    val pathChars = "/ab1_%\\$".toCharArray
    val rnd = new scala.util.Random(4242)
    def randStr(cs: Array[Char], maxLen: Int): String =
      (0 until rnd.nextInt(maxLen + 1)).map(_ => cs(rnd.nextInt(cs.length)))
        .mkString
    val pairs = (0 until 600).map { i =>
      // bias half the rules toward well-formed shapes so the matching
      // (not just the rejecting) branch gets real coverage
      val rule =
        if (i % 2 == 0) "/" + randStr(ruleChars, 8)
        else randStr(ruleChars, 9)
      val path =
        if (i % 3 == 0 && rule.startsWith("/"))
          // sometimes derive the path FROM the rule so matches happen:
          // stars swapped for literal runs, anchor stripped
          rule.stripSuffix("$").replace("*", "ab1") + randStr(pathChars, 4)
        else "/" + randStr(pathChars, 10)
      (i.toLong, rule, path)
    }
    val got = pairs.toDF("id", "rule", "path")
      .select(col("id") +:
        HostRules.robotsPathMatchRfcCols(col("path"),
          array(struct(col("rule").as("rule"),
            lit("disallow").as("action"))),
          default = "allow"): _*)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1) != null)).toMap
    var matches = 0
    pairs.foreach { case (id, rule, path) =>
      val want = refMatch(rule, path)
      if (want) matches += 1
      assert(got(id) == want,
        s"divergence on rule='$rule' path='$path': engine=${got(id)} ref=$want")
    }
    // the corpus must actually exercise the matching branch
    assert(matches > 100, s"fixture too rejecting: only $matches matches")
  }
}
