package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for URL canonicalization: each rewrite rule alone,
  * their composition, inputs that must NOT change, and idempotence
  * over every fixture. */
class UrlCanonSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(u: String): String =
    Seq(u).toDF("url").select(UrlCanon.canonicalize(col("url")))
      .head().getString(0)

  test("each rule fires alone") {
    assert(canon("https://example.com/p/1#sec") == "https://example.com/p/1")
    assert(canon("HTTPS://EXAMPLE.COM/Path") == "https://example.com/Path")
    assert(canon("https://www.example.com/a") == "https://example.com/a")
    assert(canon("https://example.com:443/a") == "https://example.com/a")
    assert(canon("http://example.com:80/a") == "http://example.com/a")
    assert(canon("https://example.com/a?b=2&a=1") == "https://example.com/a?a=1&b=2")
    assert(canon("https://example.com/a?utm_source=x&q=1") == "https://example.com/a?q=1")
    assert(canon("https://example.com/a?utm_source=x") == "https://example.com/a")
    assert(canon("https://example.com/a/") == "https://example.com/a")
  }

  test("what must survive, survives") {
    // path case is significant
    assert(canon("https://example.com/CaseSensitive") ==
      "https://example.com/CaseSensitive")
    // non-default port is part of the identity
    assert(canon("https://example.com:8443/a") == "https://example.com:8443/a")
    // :443 is only default for https (and :80 only for http)
    assert(canon("http://example.com:443/a") == "http://example.com:443/a")
    // www elsewhere than the registrable-domain head stays
    assert(canon("https://api.www-like.example.com/a") ==
      "https://api.www-like.example.com/a")
    // a non-tracking param that merely CONTAINS utm stays
    assert(canon("https://example.com/a?xutm_b=1") ==
      "https://example.com/a?xutm_b=1")
  }

  test("all dirt at once collapses to the clean form") {
    assert(canon("HTTPS://www.Example.COM:443/p/2/?b=2&a=1&utm_campaign=x#top")
      == "https://example.com/p/2?a=1&b=2")
  }

  test("percent-octet normalization (RFC 3986 §6.2.2.2)") {
    // unreserved octets DECODE: %41 'A', %7a 'z' (lowercase hex too),
    // %34 '4', %5F '_', %7E '~'
    assert(canon("https://example.com/%41%7a%34%5F%7E") ==
      "https://example.com/Az4_~")
    // reserved octets stay encoded, hex UPPERCASED — /a%2fb and
    // /a%2Fb name the same resource and must share a canonical key
    assert(canon("https://example.com/a%2fb") == "https://example.com/a%2Fb")
    assert(canon("https://example.com/a%2Fb") == "https://example.com/a%2Fb")
    // %25 (encoded '%') never decodes — decoding would re-expose a
    // '%' and break idempotence
    assert(canon("https://example.com/x%25y") == "https://example.com/x%25y")
    // malformed sequences pass through untouched
    assert(canon("https://example.com/x%4") == "https://example.com/x%4")
    assert(canon("https://example.com/x%4g/%") == "https://example.com/x%4g/%")
    // normalization applies to the query too, BEFORE param sorting
    assert(canon("https://example.com/a?x=%6a&b=1") ==
      "https://example.com/a?b=1&x=j")
  }

  test("idempotent over every fixture") {
    val fixtures = Seq(
      "https://example.com/p/1#sec", "HTTPS://EXAMPLE.COM/Path",
      "https://www.example.com/a", "https://example.com:443/a",
      "http://example.com:80/a", "https://example.com/a?b=2&a=1",
      "https://example.com/a?utm_source=x", "https://example.com/a/",
      "HTTPS://www.Example.COM:443/p/2/?b=2&a=1&utm_campaign=x#top",
      "https://example.com/", "not a url at all",
      "https://example.com/%41%7a%2f%25%4g%", "%de%ad%be%ef",
      "https://example.com/a?x=%6a&utm_source=%41")
    fixtures.foreach { u =>
      val once = canon(u)
      assert(canon(once) == once, s"not idempotent for: $u")
    }
  }
}
