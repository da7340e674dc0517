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

  test("urlNormalize: percent-encoding canonicalized (hex case, " +
      "unreserved decodes, escaped trackers)") {
    // unreserved escapes decode; reserved ones only uppercase their hex
    assert(norm("https://a.com/p%61th%7e/x%2fy").contains(
      "https://a.com/path~/x%2Fy"))
    // %2F and %2f are one octet -> one key; %61 and 'a' are one page
    assert(norm("https://a.com/x%2fy") == norm("https://a.com/x%2Fy"))
    assert(norm("https://a.com/p%61th") == norm("https://a.com/path"))
    // an escaped tracker name decodes FIRST, then gets stripped
    assert(norm("https://a.com/q?%75tm_source=1&a=2").contains(
      "https://a.com/q?a=2"))
    // query escapes normalize too
    assert(norm("https://a.com/q?k=%7ev%2f").contains(
      "https://a.com/q?k=~v%2F"))
    // malformed: a % not followed by two hex digits is rejected by the
    // URL parser itself (try_parse_url -> NULL) — quarantined upstream,
    // pctNormalize never sees it
    assert(norm("https://a.com/not%good").isEmpty)
    assert(norm("https://a.com/odd%2").isEmpty)
    // but "%fa" IS a well-formed escape of a non-unreserved octet, even
    // mid-word — hex uppercased, kept escaped
    assert(norm("https://a.com/100%fat").contains("https://a.com/100%FAt"))
    // a %-escape in the HOST is rejected by the URL parser itself
    // (try_parse_url → NULL), the same upstream quarantine as a
    // malformed path escape — host escapes never reach pctNormalize
    assert(norm("https://Ex%41mple.COM/x").isEmpty)
    assert(Seq("https://Ex%41mple.COM").toDF("u")
      .select(Web.urlHost(col("u"))).head().isNullAt(0))
  }

  test("registeredDomain: multi-part TLDs, depth, short hosts") {
    assert(regDom("news.bbc.co.uk") == "bbc.co.uk")
    assert(regDom("a.b.c.example.com") == "example.com")
    assert(regDom("example.org") == "example.org")
    assert(regDom("localhost") == "localhost")
    assert(regDom("shop.example.com.au") == "example.com.au")
    // wider static suffix subset
    assert(regDom("www.shop.com.ar") == "shop.com.ar")
    assert(regDom("x.y.co.id") == "y.co.id")
    assert(regDom("news.site.com.tw") == "site.com.tw")
  }

  test("registeredDomain: IP literals pass through unchanged (no " +
      "registrable domain — two IPs must never share a mixing key)") {
    assert(regDom("192.168.0.1") == "192.168.0.1")
    assert(regDom("10.0.0.1") == "10.0.0.1")
    // without the IP rule these two would both collapse to "0.1"
    assert(regDom("192.168.0.1") != regDom("10.77.0.1"))
    assert(regDom("[2001:db8::1]") == "[2001:db8::1]")
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

  test("pctNormalize kernel == legacy chain on adversarial escape soup " +
      "(well-formed, malformed, decode-synthesis), and the plan is " +
      "whole-stage-codegen'd again") {
    // hand-picked shapes: every hex-case combination, unreserved vs
    // reserved escapes, the documented malformed decode-synthesis case,
    // trailing/lone %, empty, no-%, adjacent and overlapping-looking
    // units, non-ASCII neighbors
    val hand = Seq(
      "", "plain", "a%2fb", "a%2Fb", "a%7eb", "%7E", "%41%42%43",
      "%61%7a%30%39", "%2d%2e%5f%7e", "%3a%2f%3f%23", "%aF%Af%af%AF",
      "x%2%34y", "%2%34", "%4%411", "%", "%a", "%g1", "%1g", "tail%",
      "tail%4", "%aab", "%aaf", "%a%af", "%aa%aa", "%%41", "%%ab",
      "a%c3%a9b", "%E2%82%AC", "p%20q%09r", "%00%01%1f", "%ff%FE",
      "%41a%42b%43c", "q=%75tm_source", "%2541", "%25%34%31")
    // plus pseudo-random soup over a hostile alphabet (deterministic)
    val rnd = new scala.util.Random(20260816L)
    val alphabet = "abcdefgh%0129AF%%xyz-._~"
    val fuzz = (1 to 300).map(_ =>
      (1 to rnd.nextInt(24)).map(_ => alphabet(rnd.nextInt(alphabet.length)))
        .mkString)
    val df = (hand ++ fuzz).toDF("s")
      .select(col("s"),
        graft.ext.Web.pctNormalize(col("s")).as("kernel"),
        graft.ext.Web.pctNormalizeChain(col("s")).as("chain"))
    val diffs = df.filter(!(col("kernel") <=> col("chain")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(diffs.isEmpty, s"kernel != chain on: ${diffs.take(5).mkString("; ")}")
    // NULL in → NULL out
    val nullRow = Seq(Option.empty[String]).toDF("s")
      .select(graft.ext.Web.pctNormalize(col("s"))).head()
    assert(nullRow.isNullAt(0))
    // tracker kernel == the HOF lambda it replaced, on param soup
    val trackerHand = Seq(
      "", "a=1", "utm_source=x", "utm_=x", "utm_a=", "utm_x", "utm=x",
      "ref=z", "reference=z", "fbclid=1&a=2", "a=1&utm_medium=m&b=2",
      "&&", "a=1&&b=2&", "utm_source=x&utm_term=y", "gclid=g&msclkid=m",
      "a=utm_source%3Dx", "ref%3Dz=1", "a&b", "=v", "a==b&utm_c=1")
    val trackerFuzz = (1 to 200).map(_ =>
      (1 to rnd.nextInt(5)).map(_ => Seq("utm_", "ref", "fbclid", "a",
        "b=", "=", "&", "1", "x=y")(rnd.nextInt(9))).mkString)
    val lambdaKept = (q: org.apache.spark.sql.Column) => array_join(
      filter(split(q, "&"),
        p => !(p.rlike(graft.ext.Web.TrackingParamPattern) || p === "")),
      "&")
    val tdf = (trackerHand ++ trackerFuzz).toDF("q")
      .select(col("q"),
        graft.functions.functions.strip_trackers(col("q")).as("kernel"),
        lambdaKept(col("q")).as("chain"))
    val tdiffs = tdf.filter(!(col("kernel") <=> col("chain")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(tdiffs.isEmpty,
      s"tracker kernel != lambda on: ${tdiffs.take(5).mkString("; ")}")
    // the motivating perf property: urlNormalize's projection compiles
    // into a WholeStageCodegen span again (the chain pushed it out).
    // A real scan (range), not a local Seq — ConvertToLocalRelation
    // folds a local relation's projection at PLAN time, leaving no
    // codegen node to inspect either way.
    val plan = spark.range(4)
      .select(concat(lit("https://x.example.com/a%2fb?c=%7ed&i="),
        col("id")).as("u"))
      .select(graft.ext.Web.urlNormalize(col("u")))
      .queryExecution.executedPlan.toString
    // codegen'd operators print star-annotated: `*(n) Project [...]`
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[CASE WHEN.*"),
      s"urlNormalize's projection is not codegen'd (no star):\n$plan")
    // attribution probe: the codegen BLOCKER was the tracker-filter
    // HOF lambda, not the replace chain — a urlNormalize twin that
    // keeps the lambda falls out of codegen even with both kernels
    // available elsewhere in the tree
    val lambdaQn = {
      val u = col("u")
      val q = graft.ext.Web.pctNormalize(
        coalesce(try_parse_url(u, lit("QUERY")), lit("")))
      array_join(filter(split(q, "&"),
        p => !(p.rlike(graft.ext.Web.TrackingParamPattern) || p === "")), "&")
    }
    val lambdaPlan = spark.range(4)
      .select(concat(lit("https://x.example.com/a%2fb?c=%7ed&i="),
        col("id")).as("u"))
      .select(lambdaQn.as("n"))
      .queryExecution.executedPlan.toString
    assert(!lambdaPlan.matches("(?s).*\\*\\(\\d+\\) Project \\[array_join.*"),
      "the HOF lambda unexpectedly codegens now — revisit whether " +
        "strip_trackers is still needed:\n" + lambdaPlan)
  }
}
