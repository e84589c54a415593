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
}
