package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sitemap parsing + recrawl-planning edges beyond the q178/q179
  * fixture: multi-line blocks, whitespace inside tags, blocks without
  * a loc, urls the state knows nothing about, and the undated-entry
  * politeness default. */
class SitemapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val xml =
    """<?xml version="1.0"?>
      |<urlset>
      |<url>
      |  <loc>  https://h/a  </loc>
      |  <lastmod>2026-08-10</lastmod>
      |</url>
      |<url><loc>https://h/b</loc></url>
      |<url><lastmod>2026-01-01</lastmod></url>
      |<url>
      |  <loc>https://h/c</loc>
      |  <lastmod>2026-08-01</lastmod>
      |</url>
      |</urlset>""".stripMargin

  test("parse: whitespace stripped, loc-less dropped, lastmod NULLable") {
    val got = Sitemap.parse(Seq(("h", xml)).toDF("host", "sm"), "host", "sm")
      .collect().map(r => (r.getString(1), Option(r.getString(2)))).toSet
    assert(got == Set(
      ("https://h/a", Some("2026-08-10")),
      ("https://h/b", None),
      ("https://h/c", Some("2026-08-01"))))
  }

  test("recrawl plan partitions into new / stale / fresh") {
    val entries = Sitemap.parse(
      Seq(("h", xml)).toDF("host", "sm"), "host", "sm")
    val state = Seq(
      ("https://h/a", "2026-08-05"),  // lastmod 08-10 > fetch → stale
      ("https://h/b", "2026-08-05"),  // undated → fresh (politeness)
      ("https://h/zzz", "2026-08-05") // state-only url: not an entry
    ).toDF("url", "last_fetch")
    val got = Sitemap.recrawlPlan(entries, state)
      .collect().map(r => r.getString(1) -> r.getString(4)).toMap
    assert(got == Map(
      "https://h/a" -> "stale",
      "https://h/b" -> "fresh",
      "https://h/c" -> "new"))
  }

  test("parseIndex: <sitemap> blocks only, opener never over-matched") {
    val idx = """<?xml version="1.0"?>
                |<sitemapindex>
                |<sitemap>
                |  <loc> https://h/s0.xml </loc>
                |  <lastmod>2026-07-01</lastmod>
                |</sitemap>
                |<sitemap><loc>https://h/s1.xml</loc></sitemap>
                |<sitemap><lastmod>2026-07-02</lastmod></sitemap>
                |</sitemapindex>""".stripMargin
    val got = Sitemap.parseIndex(
        Seq(("h", idx)).toDF("host", "xml"), "host", "xml")
      .collect()
      .map(r => r.getString(1) -> Option(r.getString(2))).toSet
    // the loc-less third block drops; <sitemapindex> itself is NOT a
    // block (its opener has no immediate '>' after "<sitemap")
    assert(got == Set(
      "https://h/s0.xml" -> Some("2026-07-01"),
      "https://h/s1.xml" -> None))
    // same entry shape ⇒ recrawlPlan triages child sitemaps unchanged
    val plan = Sitemap.recrawlPlan(
      Sitemap.parseIndex(Seq(("h", idx)).toDF("host", "xml"),
        "host", "xml"),
      Seq(("https://h/s0.xml", "2026-06-15")).toDF("url", "last_fetch"))
      .collect().map(r => r.getString(1) -> r.getString(4)).toMap
    assert(plan == Map("https://h/s0.xml" -> "stale",
      "https://h/s1.xml" -> "new"))
  }

  private def urlset(urls: String*): String =
    "<urlset>\n" + urls.map(u => s"<url><loc>$u</loc></url>").mkString("\n") +
      "\n</urlset>"
  private def index(children: String*): String =
    "<sitemapindex>\n" +
      children.map(c => s"<sitemap><loc>$c</loc></sitemap>").mkString("\n") +
      "\n</sitemapindex>"

  test("expandIndexes: cycles absorbed, self-loops too, no duplicates") {
    // root → {a, root (self-loop)}; a → {root (back-edge), leaf}
    val bodies = Seq(
      ("h", "https://h/root.xml", index("https://h/a.xml",
        "https://h/root.xml")),
      ("h", "https://h/a.xml", index("https://h/root.xml",
        "https://h/leaf.xml")),
      ("h", "https://h/leaf.xml", urlset("https://h/p0", "https://h/p1")))
      .toDF("host", "url", "xml")
    val roots = Seq(("h", "https://h/root.xml")).toDF("host", "url")
    val got = Sitemap.expandIndexes(bodies, "host", "url", "xml", roots,
        maxDepth = 5)
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(got.sorted.toSeq == Seq(
      ("https://h/leaf.xml", "https://h/p0"),
      ("https://h/leaf.xml", "https://h/p1")))
  }

  test("expandIndexes: depth cap leaves deeper tiers unexpanded") {
    // chain root → i1 → i2 → leaf: maxDepth 2 discovers i1 and i2 but
    // never OPENS i2, so the leaf's pages stay absent; maxDepth 3 gets
    // them. An unfetched child (i1 missing from bodies) just yields
    // nothing — a crawler that hasn't fetched it yet loses no rows
    // elsewhere.
    val bodies = Seq(
      ("h", "https://h/root.xml", index("https://h/i1.xml")),
      ("h", "https://h/i1.xml", index("https://h/i2.xml")),
      ("h", "https://h/i2.xml", index("https://h/leaf.xml")),
      ("h", "https://h/leaf.xml", urlset("https://h/p0")))
      .toDF("host", "url", "xml")
    val roots = Seq(("h", "https://h/root.xml")).toDF("host", "url")
    def pages(depth: Int) =
      Sitemap.expandIndexes(bodies, "host", "url", "xml", roots, depth)
        .collect().map(_.getString(2)).toSeq
    assert(pages(2).isEmpty)
    assert(pages(3) == Seq("https://h/p0"))
    // missing body: drop i1's body — the walk stops there, total
    val partial = bodies.filter(col("url") =!= "https://h/i1.xml")
    assert(Sitemap.expandIndexes(partial, "host", "url", "xml", roots,
      maxDepth = 5).count() == 0L)
  }
}
