package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-corpus curation primitives: URL normalization and registered-
  * domain extraction — the keys a crawl-scale pipeline dedupes and
  * mixes by (C4 and similar corpora deduplicate by normalized URL;
  * domain mixing needs the registrable domain, not the full host).
  *
  * Pure built-in Column compositions (parse_url / regexp / string ops —
  * no UDF), so the whole thing stays inside whole-stage codegen except
  * the short per-row query-param filter lambda; cost is O(corpus), one
  * pass, trivially partition-parallel. */
object Web {
  /** Query parameters stripped by [[urlNormalize]] — click/campaign
    * trackers that vary per impression while the document is identical
    * (utm_* et al.): exactly the params URL-dedup must ignore. */
  val TrackingParamPattern = "^(utm_[^=&]*|fbclid|gclid|msclkid|ref)="

  /** Normalize a URL for identity comparison:
    *  - scheme and host lowercased (path case is PRESERVED — paths are
    *    case-sensitive on most origins);
    *  - default ports dropped (http:80, https:443), explicit
    *    non-default ports kept;
    *  - fragment dropped (never sent to the origin);
    *  - tracking query params removed ([[TrackingParamPattern]]),
    *    remaining params kept in their original order (reordering
    *    could merge semantically different URLs on picky origins);
    *  - trailing slashes of the path collapsed ("/docs/" == "/docs";
    *    the root path "/" normalizes to "" — one canonical spelling of
    *    the origin root).
    * Unparseable URLs (no scheme/host; try_parse_url) normalize to NULL — filter or
    * quarantine them upstream. Assumes no userinfo in the authority
    * (crawl URLs; a user:pass@host URL would keep the userinfo inside
    * the lowercased host field). */
  def urlNormalize(u: Column): Column = {
    val proto = lower(try_parse_url(u, lit("PROTOCOL")))
    val host = lower(try_parse_url(u, lit("HOST")))
    val port = regexp_extract(u,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/:?#]+:(\\d+)", 1)
    val path = regexp_replace(
      coalesce(try_parse_url(u, lit("PATH")), lit("")), "/+$", "")
    val q = coalesce(try_parse_url(u, lit("QUERY")), lit(""))
    val kept = filter(split(q, "&"),
      p => !(p.rlike(TrackingParamPattern) || p === ""))
    val qn = array_join(kept, "&")
    val portPart = when(port === "" ||
        (proto === "http" && port === "80") ||
        (proto === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    when(proto.isNull || host.isNull || proto === "" || host === "",
        lit(null).cast("string"))
      .otherwise(concat(proto, lit("://"), host, portPart, path,
        when(qn === "", lit("")).otherwise(concat(lit("?"), qn))))
  }

  /** The lowercased host of a URL (no port), NULL when unparseable. */
  def urlHost(u: Column): Column = {
    val h = lower(try_parse_url(u, lit("HOST")))
    when(h === "", lit(null).cast("string")).otherwise(h)
  }

  /** Multi-part public suffixes recognized by [[registeredDomain]] —
    * a built-in subset of the common ccTLD second-level registries
    * (the full public-suffix list is a network-fetched artifact; this
    * engine is zero-egress, so the heuristic set is explicit and the
    * caller can see exactly what it covers). */
  val MultiPartTlds: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "or.jp", "ne.jp",
    "co.in", "co.nz", "com.au", "net.au", "org.au", "com.br", "com.cn",
    "com.mx", "co.za", "com.sg", "com.tr", "co.kr")

  /** The registrable domain of a host: the last two labels, or the
    * last three when the last two form a recognized multi-part public
    * suffix ([[MultiPartTlds]]) — "news.bbc.co.uk" → "bbc.co.uk",
    * "a.b.example.com" → "example.com". Hosts with ≤ 2 labels (and IP
    * literals, which have no registrable domain) pass through
    * unchanged. The domain-mixing key for [[Corpus.mixtureSample]]. */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".",
      element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".", element_at(labels, -3),
      element_at(labels, -2), element_at(labels, -1))
    when(host.isNull, lit(null).cast("string"))
      .when(n <= 2, host)
      .when(last2.isin(MultiPartTlds: _*) && n >= 3, last3)
      .otherwise(last2)
  }

  /** URL-level exact dedup: one row per distinct [[urlNormalize]]d URL
    * with the minimum-id keeper and the duplicate count — the C4-style
    * re-crawl collapse, grouped on the normalized key so tracking-param
    * and case/port/slash variants of one page dedup together.
    * Unparseable URLs (normalize → NULL) are EXCLUDED (quarantine them
    * separately; a shared NULL group would silently merge them all). */
  def urlDedup(df: org.apache.spark.sql.DataFrame, idCol: String,
      urlCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(idCol).as("id"), urlNormalize(col(urlCol)).as("url_norm"))
      .filter(col("url_norm").isNotNull)
      .groupBy("url_norm")
      .agg(min(col("id")).as("keeper"), count(lit(1)).as("cnt"))
}
