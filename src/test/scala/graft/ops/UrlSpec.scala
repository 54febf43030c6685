package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Hand-pinned canonicalization cases for [[Url]] — each RFC 3986 §6
  * rule and both de-facto crawl rules, including the negative
  * controls (non-default port kept, path/query case untouched,
  * `:443` NOT stripped under http). */
class UrlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("u").select(Url.canonicalizeUrl(col("u"))).head().getString(0)

  test("scheme and host lowercase; path and query case preserved") {
    assert(canon("HTTPS://Example.COM/Path/File?Key=Value") ===
      "https://example.com/Path/File?Key=Value")
  }

  test("default ports dropped only under their own scheme") {
    assert(canon("https://a.com:443/x") === "https://a.com/x")
    assert(canon("http://a.com:80/x") === "http://a.com/x")
    // :443 is NOT http's default; :8080 is nobody's default.
    assert(canon("http://a.com:443/x") === "http://a.com:443/x")
    assert(canon("https://a.com:8080/x") === "https://a.com:8080/x")
  }

  test("www. dropped, duplicate slashes collapsed, fragment dropped") {
    assert(canon("http://www.a.com//b///c#frag") === "http://a.com/b/c")
    // only a LEADING www. is a spelling artifact
    assert(canon("http://wwwx.a.com/x") === "http://wwwx.a.com/x")
    assert(canon("http://a.www.com/x") === "http://a.www.com/x")
  }

  test("utm_* dropped, remaining params sorted, empty query loses its ?") {
    assert(canon("http://a.com/x?utm_source=s&b=2&a=1&utm_campaign=c") ===
      "http://a.com/x?a=1&b=2")
    assert(canon("http://a.com/x?utm_source=only") === "http://a.com/x")
    assert(canon("http://a.com/x?") === "http://a.com/x")
  }

  test("order-invariance: permuted params share one canonical form") {
    assert(canon("http://a.com/x?b=2&a=1") === canon("HTTP://A.com/x?a=1&b=2#z"))
  }

  test("bare host and pathless URLs survive") {
    assert(canon("http://a.com") === "http://a.com")
    assert(canon("https://WWW.A.com:443?z=1&utm_x=2") === "https://a.com?z=1")
  }
}
