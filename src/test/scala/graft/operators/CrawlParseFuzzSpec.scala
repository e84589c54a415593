package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Poison-text totality for the crawl parsers: robots.txt and
  * sitemap.xml arrive from the open web, so the parse chains must be
  * TOTAL — rows out (possibly zero rules/entries) for ANY text in,
  * crash-free, and structurally bounded (a parser must never emit
  * more directive rows than input lines, nor more entries than
  * `<url>` openers). Same bar as MultimodalFuzzSpec's decoders:
  * random text, structure-aware mutations, and truncations of VALID
  * bodies at every prefix — the class that finds parser edges random
  * text never reaches. */
class CrawlParseFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val validRobots =
    "# c\r\nUser-agent: graftbot\nDisallow: /a\nAllow: /a/b$\n" +
      "Crawl-delay: 2\n\nUser-agent: *\nDisallow: /\n" +
      "Sitemap: https://h/x.xml\n"
  private val validSitemap =
    "<?xml version=\"1.0\"?>\n<urlset>\n<url>\n  <loc> https://h/a </loc>\n" +
      "  <lastmod>2026-08-10</lastmod>\n</url>\n" +
      "<url><loc>https://h/b</loc></url>\n</urlset>\n"

  private def parseAll(bodies: Seq[String]): Unit = {
    val df = bodies.zipWithIndex.map { case (b, i) => (s"h$i", b) }
      .toDF("host", "body")
    // robots: directives ≤ non-empty lines; selection total; the
    // admit chain yields exactly one verdict row per doc
    val dv = Robots.parseDirectives(df, "host", "body")
    assert(dv.count() <=
      df.select(sum(size(split(col("body"), "\n")))).collect()(0).getLong(0))
    Robots.selectRules(dv, "GraftBot").collect() // total, finite
    // crawl-delay: total, ≤ one row per host, values strictly positive
    val delays = Robots.selectCrawlDelay(dv, "GraftBot").collect()
    assert(delays.length <= bodies.size)
    assert(delays.forall(_.getDouble(1) > 0))
    // sitemap declarations: total, ≤ one row per input line
    assert(Robots.sitemapDirectives(df, "host", "body").count() <=
      df.select(sum(size(split(col("body"), "\n")))).collect()(0).getLong(0))
    val docs = bodies.indices.map(i => (i.toLong, s"h$i", "/a/b/c"))
      .toDF("doc_id", "host", "path")
    assert(Robots.admit(docs, "doc_id", "host", "path", df, "host",
      "body", "GraftBot", "allow").count() == bodies.size)
    assert(Robots.admitProjected(docs, "doc_id", "host", "path", df,
      "host", "body", "GraftBot", "allow").count() == bodies.size)
    // sitemap: entries ≤ <url> openers; recrawl plan total
    val entries = Sitemap.parse(df.withColumnRenamed("body", "xml"),
      "host", "xml")
    val openers = df.select(sum(
      (length(col("body")) - length(replace(col("body"), lit("<url>"),
        lit("")))) / 5)).collect()(0)
    assert(entries.count() <= Option(openers.get(0))
      .map(_.toString.toDouble.toLong).getOrElse(0L))
    Sitemap.recrawlPlan(entries,
      Seq(("https://h/a", "2026-08-01")).toDF("url", "last_fetch"))
      .collect()
  }

  test("random text: parsers are total") {
    val gen = Gen.chooseNum(0, 400).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Char.MinValue, 0x2FF.toChar)).map(_.mkString))
    val bodies = (1 to 40).flatMap(i =>
      gen(Gen.Parameters.default.withSize(i * 7), org.scalacheck.rng.Seed(i)))
    parseAll(bodies)
  }

  test("structure-aware mutations: valid keywords, hostile bodies") {
    val bodies = Seq(
      "User-agent:", "User-agent: \nDisallow", "Disallow: /a",
      "User-agent: *\nUser-agent: *\nUser-agent: *",
      "Disallow: /\nUser-agent: *", ":", "::", "a:b:c\nUser-agent: x",
      "User-agent: graftbot\n" + ("Disallow: /a\n" * 200),
      "Crawl-delay:", "Crawl-delay: -1\nUser-agent: *",
      "User-agent: *\ncrawl-delay: 1e309", // Infinity: positive, total
      "User-agent: *\nCrawl-delay: nan\nCrawl-delay: fast",
      "Sitemap:", "Sitemap: notaurl", "SITEMAP: ::::",
      "sitemap: https://h/x\nsitemap: https://h/x", // distinct-collapsed
      "<url>", "</url><url>", "<url><loc></loc></url>",
      "<url><loc><loc>nested</loc></loc></url>",
      "<urlset>" + ("<url><loc>u</loc></url>" * 300) + "</urlset>",
      "<url><lastmod>x</lastmod></url>", "<loc>orphan</loc>",
      "\u0000\u0001<url><loc>\u0000</loc></url>")
    parseAll(bodies)
  }

  test("every truncation prefix of valid bodies parses clean") {
    val bodies = (0 to validRobots.length).map(validRobots.take) ++
      (0 to validSitemap.length).map(validSitemap.take)
    parseAll(bodies)
  }
}
