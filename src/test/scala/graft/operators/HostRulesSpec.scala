package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for hierarchical host rules: longest-suffix wins, an
  * allow exception carves out of a broader block, unmatched hosts get
  * the default with a NULL rule, and a rule never matches a host it is
  * merely a substring of. */
class HostRulesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rules = Seq(
    "example.org" -> "block",
    "good.example.org" -> "allow",
    "bad.good.example.org" -> "block")

  private def verdicts(hosts: (Long, String)*) =
    HostRules.longestSuffixMatch(hosts.toDF("id", "host"), "id", "host",
        rules, default = "allow")
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.getString(2)).getOrElse("-"), r.getString(3))).toMap

  test("longest suffix wins at every depth") {
    val v = verdicts(
      1L -> "example.org",           // depth-1 block
      2L -> "x.example.org",         // inherits the block
      3L -> "good.example.org",      // allow exception
      4L -> "y.good.example.org",    // inherits the exception
      5L -> "bad.good.example.org",  // re-blocked below the exception
      6L -> "z.bad.good.example.org")
    assert(v(1L) == ("example.org", "block"))
    assert(v(2L) == ("example.org", "block"))
    assert(v(3L) == ("good.example.org", "allow"))
    assert(v(4L) == ("good.example.org", "allow"))
    assert(v(5L) == ("bad.good.example.org", "block"))
    assert(v(6L) == ("bad.good.example.org", "block"))
  }

  test("no rule → NULL match and the default action") {
    val v = verdicts(1L -> "other.net", 2L -> "org")
    assert(v(1L) == ("-", "allow"))
    assert(v(2L) == ("-", "allow"))
  }

  test("suffix match is label-aligned, never substring") {
    // notexample.org must NOT match the example.org rule
    val v = verdicts(1L -> "notexample.org", 2L -> "example.org.evil.com")
    assert(v(1L) == ("-", "allow"))
    // example.org appearing mid-host (not as the suffix) must not match
    assert(v(2L) == ("-", "allow"))
  }

  test("path rules: longest prefix wins, segment-aligned, exceptions carve") {
    val pathRules = Seq("/static" -> "disallow", "/static/p1" -> "allow",
      "/api" -> "disallow")
    val v = HostRules.longestPathPrefixMatch(
      Seq(1L -> "/static/p2/x1", 2L -> "/static/p1/x1", 3L -> "/api/p0/x0",
        4L -> "/docs/p0/x0", 5L -> "/apix/p0/x0", 6L -> "/static")
        .toDF("id", "path"),
      "id", "path", pathRules, default = "allow")
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.getString(2)).getOrElse("-"), r.getString(3))).toMap
    assert(v(1L) == ("/static", "disallow"))
    assert(v(2L) == ("/static/p1", "allow"))   // exception wins by depth
    assert(v(3L) == ("/api", "disallow"))
    assert(v(4L) == ("-", "allow"))            // no rule → default
    assert(v(5L) == ("-", "allow"))            // /apix must NOT match /api
    assert(v(6L) == ("/static", "disallow"))   // exact-path match
  }

  test("PSL projection variant ≡ join variant over every rule kind") {
    import org.apache.spark.sql.functions.col
    // exact multi-label, plain TLD, wildcard child, the exception
    // carved back out of it — the q172 rule census
    val psl = Seq("com", "org", "co.uk", "*.pages.org", "!keep.pages.org")
    val hosts = Seq(
      1L -> "example.org",            // exact TLD → etld1 example.org
      2L -> "www.example.org",
      3L -> "shop.co.uk",             // multi-label exact
      4L -> "a.b.shop.co.uk",
      5L -> "proj.pages.org",         // wildcard: proj.pages.org IS a ps
      6L -> "site.proj.pages.org",
      7L -> "keep.pages.org",         // exception: ps = pages.org
      8L -> "www.keep.pages.org",
      9L -> "org",                    // host IS a public suffix → etld1 NULL
      10L -> "unlisted.zz",           // default * rule: top label is ps
      11L -> "zz").toDF("id", "host")
    val joined = HostRules.registrableDomain(hosts, "id", "host", psl)
    val exprd = hosts.select(col("id") +: col("host") +:
      HostRules.registrableDomainCols(col("host"), psl): _*)
    assert(joined.exceptAll(exprd).isEmpty && exprd.exceptAll(joined).isEmpty)
    // spot-pin the semantics, not just the equivalence
    val v = exprd.collect()
      .map(r => r.getLong(0) -> (r.getString(2), Option(r.getString(3)))).toMap
    assert(v(1L) == ("org", Some("example.org")))
    assert(v(5L) == ("proj.pages.org", None))
    assert(v(6L) == ("proj.pages.org", Some("site.proj.pages.org")))
    assert(v(7L) == ("pages.org", Some("keep.pages.org")))
    assert(v(9L) == ("org", None))
    assert(v(10L) == ("zz", Some("unlisted.zz")))
  }

  test("the stateless projection variant agrees with the join variant") {
    val hosts = Seq(
      1L -> "example.org", 2L -> "x.example.org", 3L -> "good.example.org",
      4L -> "y.good.example.org", 5L -> "bad.good.example.org",
      6L -> "z.bad.good.example.org", 7L -> "other.net",
      8L -> "notexample.org").toDF("id", "host")
    val joined = HostRules.longestSuffixMatch(hosts, "id", "host",
      rules, default = "allow")
    val exprd = hosts.select(
      Seq(org.apache.spark.sql.functions.col("id"),
          org.apache.spark.sql.functions.col("host")) ++
        HostRules.longestSuffixMatchCols(
          org.apache.spark.sql.functions.col("host"), rules,
          default = "allow"): _*)
    assert(joined.exceptAll(exprd).isEmpty && exprd.exceptAll(joined).isEmpty)
  }
}
