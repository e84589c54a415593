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

  /** Independent §2.2.2 octet normalization: sequential scan (NOT the
    * engine's sentinel-split formulation) — uppercase valid `%xx`
    * hex, decode unreserved octets, pass malformed heads through. */
  private def refPctNorm(s: String): String = {
    def isHex(c: Char) =
      (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
    def unreserved(code: Int) =
      (code >= 'A' && code <= 'Z') || (code >= 'a' && code <= 'z') ||
        (code >= '0' && code <= '9') ||
        code == '-' || code == '.' || code == '_' || code == '~'
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '%' && i + 2 < s.length &&
          isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        val hx = s.substring(i + 1, i + 3)
        val code = Integer.parseInt(hx, 16)
        if (unreserved(code)) sb.append(code.toChar)
        else { sb.append('%'); sb.append(hx.toUpperCase) }
        i += 3
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    // the engine strips U+0001 (its split sentinel; illegal in URLs)
    sb.toString.replace("\u0001", "")
  }

  /** Independent reference: RFC 9309 match as greedy regex over
    * octet-NORMALIZED rule core and path (§2.2.2). */
  private def refMatch(rule: String, path: String): Boolean = {
    if (!rule.startsWith("/")) return false
    val anchored = rule.endsWith("$")
    val core = refPctNorm(if (anchored) rule.dropRight(1) else rule)
    // split keeps empty literals ("-1") so "/a**b" and trailing stars
    // keep their semantics; quote() makes every literal octet literal
    val rx = core.split("\\*", -1)
      .map(s => if (s.isEmpty) "" else java.util.regex.Pattern.quote(s))
      .mkString(".*")
    val m = java.util.regex.Pattern.compile("(?s)" + rx)
      .matcher(refPctNorm(path))
    if (anchored) m.matches() else m.lookingAt()
  }

  test("LIKE-compiled matcher ≡ regex reference over hostile alphabets") {
    import spark.implicits._
    // '4'/'7' make random "%xx" runs hit REAL hex pairs on both the
    // decode branch (%41→'A', %7a→'z', %74→'t') and the
    // uppercase-keep branch (%ab→%AB) — the §2.2.2 normalization path
    val ruleChars = "/ab147*$_%\\".toCharArray
    val pathChars = "/ab147_%\\$".toCharArray
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

  /** Independent precedence reference — RFC 9309 §2.2.2 "most
    * octets" as Google's parser computes it: total pattern length
    * (trailing `$` excluded, stars counted), allow over an
    * equal-length disallow, rule text as the final tie-break. */
  private def refBest(rules: Seq[(String, String)],
                      path: String): Option[(String, String)] = {
    val hit = rules.filter { case (r, _) => refMatch(r, path) }
    if (hit.isEmpty) None
    else Some(hit.minBy { case (r, a) =>
      (-(r.length - (if (r.endsWith("$")) 1 else 0)),
        if (a == "allow") 0 else 1, r) })
  }

  test("multi-rule precedence ≡ most-octets reference (Google flip incl.)") {
    import spark.implicits._
    val ruleChars = "/ab147*$_%\\".toCharArray
    val pathChars = "/ab147_%\\$".toCharArray
    val rnd = new scala.util.Random(777)
    def randStr(cs: Array[Char], maxLen: Int): String =
      (0 until rnd.nextInt(maxLen + 1)).map(_ => cs(rnd.nextInt(cs.length)))
        .mkString
    val cases = (0 until 400).map { i =>
      val path = "/" + randStr(pathChars, 10)
      val nRules = 3 + rnd.nextInt(6)
      val rules = (0 until nRules).map { j =>
        // bias toward rules derived from the path so several rules
        // MATCH the same path and precedence actually decides
        val r =
          if (j % 2 == 0 && path.length > 1) {
            val cut = 1 + rnd.nextInt(path.length - 1)
            val base = path.take(cut)
            rnd.nextInt(4) match {
              case 0 => base
              case 1 => base + "*"
              case 2 => "/" + "*" + base.drop(1 + rnd.nextInt(base.length))
              case _ => path + "$"
            }
          } else "/" + randStr(ruleChars, 8)
        (r, if (rnd.nextBoolean()) "allow" else "disallow")
      }
      (i.toLong, path, rules)
    } :+
      // the ADVICE flip case verbatim: Google/RFC verdict is ALLOW
      (400L, "/page1", Seq("/page" -> "disallow", "/page*" -> "allow"))
    val got = cases.toDF("id", "path", "rules")
      .select(col("id"),
        HostRules.robotsPathMatchRfcCols(col("path"),
          transform(col("rules"), r =>
            struct(r.getField("_1").as("rule"),
              r.getField("_2").as("action"))),
          default = "allow")(0),
        HostRules.robotsPathMatchRfcCols(col("path"),
          transform(col("rules"), r =>
            struct(r.getField("_1").as("rule"),
              r.getField("_2").as("action"))),
          default = "allow")(1))
      .collect()
      .map(r => r.getLong(0) -> ((Option(r.getString(1)), r.getString(2))))
      .toMap
    var decided = 0
    cases.foreach { case (id, path, rules) =>
      val want = refBest(rules, path)
      val wantRule = want.map(_._1)
      val wantAct = want.map(_._2).getOrElse("allow")
      if (rules.count { case (r, _) => refMatch(r, path) } > 1) decided += 1
      assert(got(id) == ((wantRule, wantAct)),
        s"precedence divergence on path='$path' rules=$rules: " +
          s"engine=${got(id)} ref=($wantRule, $wantAct)")
    }
    // the corpus must actually exercise contested precedence
    assert(decided > 100, s"fixture too sparse: only $decided contested")
    // and the flip case must land on the RFC/Google verdict
    assert(got(400L) == ((Some("/page*"), "allow")))
  }

  test("driver-side compile twins ≡ Column chains on hostile strings") {
    import spark.implicits._
    // the r13 hoist ships DRIVER-compiled patterns for literal rule
    // lists (compileRfcPatternStr / percentNormalizeStr) — any
    // divergence from the Column chains would silently split the
    // verdict between admitRfc (relation compile) and
    // robotsPathMatchRfc (driver compile)
    val chars = "/ab147*$_%\\~.-".toCharArray
    val rnd = new scala.util.Random(1414)
    def randStr(maxLen: Int): String =
      (0 until rnd.nextInt(maxLen + 1)).map(_ => chars(rnd.nextInt(chars.length)))
        .mkString
    val edge = Seq("", "%", "%4", "%4g", "%41", "%7a", "%2f", "%2F",
      "%25", "%255A", "a%", "%%41", "%41%42", "/ab", "%0001",
      "*$", "$", "/*$", "\\%_")
    val inputs = (edge ++ (0 until 400).map(_ => randStr(12)))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val rows = inputs.toDF("id", "s")
      .select(col("id"), UrlCanon.percentNormalize(col("s")).as("pn"),
        HostRules.compileRfcPatternCol(col("s")).as("pat"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    inputs.foreach { case (id, s) =>
      assert(rows(id)._1 == UrlCanon.percentNormalizeStr(s),
        s"percentNormalize twin divergence on '$s'")
      assert(rows(id)._2 == HostRules.compileRfcPatternStr(s),
        s"compileRfcPattern twin divergence on '$s'")
    }
  }
}
