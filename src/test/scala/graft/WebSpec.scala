package graft

import org.apache.spark.sql.functions._

import graft.ext.Web

/** URL normalization / registered-domain edge cases the fixture-derived
  * oracle queries don't reach. */
class WebSpec extends SparkSuite {
  import spark.implicits._

  private def norm(u: String): Option[String] = {
    val r = Seq(u).toDF("u").select(Web.urlNormalize(col("u"))).head()
    if (r.isNullAt(0)) None else Some(r.getString(0))
  }
  private def regDom(h: String): String =
    Seq(h).toDF("h").select(Web.registeredDomain(col("h"))).head().getString(0)

  test("urlNormalize: ports, case, fragments, tracking params, slashes") {
    // scheme+host lowercased, PATH case preserved
    assert(norm("HTTPS://WWW.Site.COM/Mixed/Case").contains(
      "https://www.site.com/Mixed/Case"))
    // default ports dropped, non-default kept
    assert(norm("http://a.com:80/x").contains("http://a.com/x"))
    assert(norm("https://a.com:443/x").contains("https://a.com/x"))
    assert(norm("https://a.com:8443/x").contains("https://a.com:8443/x"))
    assert(norm("http://a.com:443/x").contains("http://a.com:443/x"))
    // fragment dropped; tracking-only query loses its '?'
    assert(norm("https://a.com/p?utm_source=x&utm_medium=y#sec")
      .contains("https://a.com/p"))
    // kept params preserve original order; trackers removed in place
    assert(norm("https://a.com/p?b=2&utm_source=x&a=1&gclid=g")
      .contains("https://a.com/p?b=2&a=1"))
    // trailing slashes collapse; the bare root normalizes to the origin
    assert(norm("https://a.com/docs///").contains("https://a.com/docs"))
    assert(norm("https://a.com/").contains("https://a.com"))
    assert(norm("https://a.com").contains("https://a.com"))
    // variants of one page converge on one key
    val variants = Seq(
      "HTTPS://A.com:443/p/?utm_source=1#x",
      "https://a.COM/p?utm_campaign=2",
      "https://a.com/p/")
    assert(variants.flatMap(norm).distinct == Seq("https://a.com/p"))
    // unparseable (no scheme/host) -> NULL, never a silently-shared key
    assert(norm("not a url").isEmpty)
    assert(norm("/relative/path").isEmpty)
  }

  test("registeredDomain: multi-part TLDs, depth, short hosts") {
    assert(regDom("news.bbc.co.uk") == "bbc.co.uk")
    assert(regDom("a.b.c.example.com") == "example.com")
    assert(regDom("example.org") == "example.org")
    assert(regDom("localhost") == "localhost")
    assert(regDom("shop.example.com.au") == "example.com.au")
  }

  test("urlDedup groups variants, excludes unparseables") {
    val df = Seq(
      (1L, "https://a.com/p?utm_source=x"),
      (2L, "HTTPS://A.COM:443/p/"),
      (3L, "https://a.com/q"),
      (4L, "garbage")).toDF("doc_id", "url")
    val got = Web.urlDedup(df, "doc_id", "url")
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("https://a.com/p", 1L, 2L), ("https://a.com/q", 3L, 1L)),
      got.toString)
  }
}
