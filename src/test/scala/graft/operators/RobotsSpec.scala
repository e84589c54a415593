package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Edge coverage for the robots.txt end-to-end chain beyond the
  * q175/q176 fixture: CRLF bodies, directive-key casing, a host whose
  * robots matches NEITHER the token nor `*` (no governing group → no
  * rules → everything admitted by default), and group-merge when two
  * separated groups both name the token. */
class RobotsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rulesFor(body: String, ua: String = "GraftBot") =
    Robots.selectRules(
        Robots.parseDirectives(Seq(("h", body)).toDF("host", "robots"),
          "host", "robots"), ua)
      .collect().map(r => (r.getString(1), r.getString(2))).toSet

  private def delayFor(body: String, ua: String = "GraftBot") =
    Robots.selectCrawlDelay(
        Robots.parseDirectives(Seq(("h", body)).toDF("host", "robots"),
          "host", "robots"), ua)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      .get("h")

  test("crawl-delay: exact-UA group beats the star group's decoy") {
    val body = """User-agent: graftbot
                 |Disallow: /a
                 |Crawl-delay: 10
                 |
                 |User-agent: *
                 |Crawl-delay: 1""".stripMargin
    assert(delayFor(body).contains(10.0))
    // the star value governs a token with no exact group
    assert(delayFor(body, ua = "otherbot").contains(1.0))
  }

  test("crawl-delay: merged exact groups take the conservative max") {
    val body = """User-agent: graftbot
                 |Crawl-delay: 2
                 |
                 |User-agent: graftbot
                 |Crawl-delay: 7""".stripMargin
    assert(delayFor(body).contains(7.0))
  }

  test("crawl-delay: malformed / non-positive values read as unstated") {
    assert(delayFor("User-agent: graftbot\nCrawl-delay: fast\n").isEmpty)
    assert(delayFor("User-agent: graftbot\nCrawl-delay: -3\n").isEmpty)
    assert(delayFor("User-agent: graftbot\nCrawl-delay: 0\n").isEmpty)
    // fractional delays are legal (Yandex documents them)
    assert(delayFor("User-agent: graftbot\nCrawl-delay: 0.5\n")
      .contains(0.5))
  }

  test("crawl-delay line terminates a user-agent header block") {
    // RFC 9309 §2.2.1: any non-UA line ends the header block, so the
    // second UA opens a NEW group — graftbot's group must NOT inherit
    // the star group's delay or rules
    val body = """User-agent: *
                 |Crawl-delay: 30
                 |User-agent: graftbot
                 |Disallow: /g""".stripMargin
    assert(delayFor(body).isEmpty)
    assert(rulesFor(body) == Set("/g" -> "disallow"))
  }

  test("sitemap directives: group-independent, absolute-only, case-folded") {
    val body = """User-agent: graftbot
                 |Disallow: /a
                 |SITEMAP: https://h.example/s1.xml  # trailing comment
                 |
                 |User-agent: otherbot
                 |sitemap: https://h.example/s2.xml
                 |Sitemap: /relative/dropped.xml
                 |Sitemap: ftp://h.example/s3.xml""".stripMargin
    val urls = Robots.sitemapDirectives(
        Seq(("h", body)).toDF("host", "robots"), "host", "robots")
      .collect().map(_.getString(1)).toSet
    // both groups' declarations surface (group-independent), the
    // relative value is dropped, ftp scheme is still a scheme
    assert(urls == Set("https://h.example/s1.xml",
      "https://h.example/s2.xml", "ftp://h.example/s3.xml"))
    // and the rule parse is untouched by the sitemap lines
    assert(rulesFor(body) == Set("/a" -> "disallow"))
  }

  test("CRLF line endings and mixed directive-key casing parse clean") {
    val body = "USER-AGENT: GRAFTBOT\r\ndisallow: /a\r\nALLOW: /a/b\r\n"
    assert(rulesFor(body) == Set("/a" -> "disallow", "/a/b" -> "allow"))
  }

  test("no matching group at all yields zero rules") {
    val body = "User-agent: zzzbot\nDisallow: /\n"
    assert(rulesFor(body).isEmpty)
  }

  test("star group is ignored once any exact group exists") {
    val body = "User-agent: *\nDisallow: /\n\nUser-agent: graftbot\nDisallow: /x\n"
    assert(rulesFor(body) == Set("/x" -> "disallow"))
  }

  test("two separated exact groups merge their rules") {
    val body = "User-agent: graftbot\nDisallow: /a\n\n" +
      "User-agent: other\nDisallow: /b\n\n" +
      "User-agent: graftbot\nDisallow: /c\n"
    assert(rulesFor(body) == Set("/a" -> "disallow", "/c" -> "disallow"))
  }

  test("empty Disallow terminates a header block but emits no rule") {
    // the second User-agent line follows a RULE line (the empty
    // Disallow), so it starts a NEW group rather than joining the first
    val body = "User-agent: graftbot\nDisallow:\n" +
      "User-agent: other\nDisallow: /only-others\n"
    assert(rulesFor(body).isEmpty)
  }

  test("Disallow: / blocks every path, with a prefix carve-out") {
    val docs = Seq((1L, "h", "/a/b/c"), (2L, "h", "/docs/x"), (3L, "h", "/"))
      .toDF("doc_id", "host", "path")
    val bodies = Seq(("h",
      "User-agent: graftbot\nDisallow: /\nAllow: /docs\n"))
      .toDF("host", "robots")
    val v = Robots.admit(docs, "doc_id", "host", "path", bodies, "host",
        "robots", "GraftBot", default = "allow")
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(v(1L) == "disallow") // the m=0 "/" probe key must exist
    assert(v(2L) == "allow")    // longer literal carves the exception
    assert(v(3L) == "disallow") // the literal root path itself
  }

  test("a crawler-trap path of 40 segments neither explodes nor errors") {
    val deep = "/a" + (1 to 39).map(i => s"/s$i").mkString
    val v = HostRules.robotsPathMatch(
        Seq((1L, deep), (2L, "/b/c")).toDF("doc_id", "path"),
        "doc_id", "path", rules = Seq("/a" -> "disallow"),
        default = "allow")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    // segments beyond the cap still generate the capped PREFIX forms,
    // so shallow rules keep matching deep paths
    assert(v(1L) == "disallow")
    assert(v(2L) == "allow")
  }

  test("full-RFC grammar: spanning stars, literal underscore, no cap") {
    val rules = Seq(
      "/a" -> "disallow", "/a*z" -> "allow",   // star spans segments
      "/w_p" -> "disallow",                     // _ is a literal octet
      "/q/r$" -> "allow", "/q" -> "disallow",   // anchored exact
      "/deep" -> "disallow",
      "/deep/d1/d2/d3/d4/d5/d6/d7/d8" -> "allow")
    val deep = "/deep" + (1 to 11).map(i => s"/d$i").mkString
    val v = HostRules.robotsPathMatchRfc(
        Seq(1L -> "/a/b/c/z", 2L -> "/a/b/c", 3L -> "/w_p/x",
          4L -> "/wxp/x", 5L -> "/q/r", 6L -> "/q/r/s",
          7L -> deep).toDF("doc_id", "path"),
        "doc_id", "path", rules, default = "allow")
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.getString(2)).getOrElse("-"), r.getString(3))).toMap
    assert(v(1L) == ("/a*z", "allow"))  // star crossed two segments
    assert(v(2L) == ("/a", "disallow")) // no z → only the prefix rule
    assert(v(3L) == ("/w_p", "disallow"))
    assert(v(4L) == ("-", "allow"))     // _ must NOT wildcard onto x
    assert(v(5L) == ("/q/r$", "allow")) // anchored exact match
    assert(v(6L) == ("/q", "disallow")) // anchor rejects the longer path
    // NO depth cap: the 9-segment rule prefixes the 12-segment path
    assert(v(7L) == ("/deep/d1/d2/d3/d4/d5/d6/d7/d8", "allow"))
  }

  test("RFC e2e: byte-prefix governs where segment alignment doesn't") {
    val docs = Seq((1L, "h", "/static-archive/p9"), (2L, "h", "/static/p3"))
      .toDF("doc_id", "host", "path")
    val bodies = Seq(("h", "User-agent: graftbot\nDisallow: /static\n"))
      .toDF("host", "robots")
    def verdicts(f: => org.apache.spark.sql.DataFrame) =
      f.collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    val rfc = verdicts(Robots.admitRfc(docs, "doc_id", "host", "path",
      bodies, "host", "robots", "GraftBot", "allow"))
    val seg = verdicts(Robots.admitProjected(docs, "doc_id", "host", "path",
      bodies, "host", "robots", "GraftBot", "allow"))
    // the RFC reads Disallow: /static as a BYTE prefix (Google's
    // parser semantics); the joinable segment class does not
    assert(rfc(1L) == "disallow" && seg(1L) == "allow")
    assert(rfc(2L) == "disallow" && seg(2L) == "disallow")
  }

  test("projection variant ≡ join variant across the whole grammar") {
    import org.apache.spark.sql.functions._
    val rules = Seq("/static" -> "disallow", "/static/p1" -> "allow",
      "/*/p2" -> "disallow", "/docs/*/x3" -> "allow",
      "/api" -> "disallow", "/api/p0/x1$" -> "allow",
      "/img/*/x5" -> "disallow", "/" -> "disallow", "/docs" -> "allow",
      "no-slash" -> "disallow") // must match nothing in BOTH variants
    val paths = (0 until 60).map { i =>
      (i.toLong, "/" + Seq("docs", "static", "api", "img")(i % 4) +
        s"/p${i % 5}/x${i % 7}")
    } ++ Seq((100L, "/"), (101L, "/docs"),
      (102L, "/a/b/c/d/e/f/g/h/i/j/k/l")) // past the expansion cap
    val docs = paths.toDF("doc_id", "path").withColumn("host", lit("h"))
    val hostRules = rules.toDF("rule", "action").withColumn("host", lit("h"))
    val viaJoin = HostRules.robotsPathMatchAgainst(docs, "doc_id", "host",
      "path", hostRules, default = "allow")
    val arr = hostRules.groupBy(col("host"))
      .agg(sort_array(collect_list(struct(col("rule"), col("action"))))
        .as("_rules"))
      .withColumnRenamed("host", "_rh")
    val viaCols = docs.join(arr, col("host") === col("_rh"), "left")
      .select(col("doc_id") +: col("host") +: col("path") +:
        HostRules.robotsPathMatchCols(col("path"), col("_rules"),
          default = "allow"): _*)
    assert(viaJoin.exceptAll(viaCols).isEmpty &&
      viaCols.exceptAll(viaJoin).isEmpty)
    // and the root-disallow actually bites in both
    val v = viaCols.collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(v(100L) == "disallow" && v(101L) == "allow")
  }

  test("end-to-end: a host with no governing group admits every path") {
    val docs = Seq((1L, "h1", "/a/b"), (2L, "h2", "/a/b"))
      .toDF("doc_id", "host", "path")
    val bodies = Seq(
      ("h1", "User-agent: graftbot\nDisallow: /a\n"),
      ("h2", "User-agent: zzzbot\nDisallow: /\n")).toDF("host", "robots")
    val v = Robots.admit(docs, "doc_id", "host", "path", bodies, "host",
        "robots", "GraftBot", default = "allow")
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(v(1L) == "disallow") // h1's own /a prefix rule
    assert(v(2L) == "allow")    // h2 has no governing group
  }
}
