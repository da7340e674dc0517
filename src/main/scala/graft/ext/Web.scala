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

  /** Hex digits that appear lowercased in percent escapes. Shared with
    * the SQL-oracle mirror generator, which derives the identical
    * replace chain from these same tables. */
  private[graft] val HexLetters = "abcdef"

  /** The RFC 3986 unreserved characters as (canonical escape → char)
    * decode pairs — ALPHA / DIGIT / "-" / "." / "_" / "~". Escaping
    * these never changes a URL's meaning, so their escapes decode
    * during normalization; every other escape (reserved delimiters like
    * %2F, arbitrary octets) is KEPT, since decoding it would move the
    * URL's delimiters. */
  private[graft] val UnreservedDecodes: Seq[(String, String)] =
    (('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '9') ++ Seq('-', '.', '_', '~'))
      .map(c => (f"%%${c.toInt}%02X", c.toString))

  /** Canonicalize percent-encoding (RFC 3986 §6.2.2.1-2): the hex
    * digits of every %XX escape uppercased ("%2f" ≡ "%2F" — same
    * octet), then escapes of UNRESERVED characters decoded
    * ("%7Euser" ≡ "~user"). A chain of codegen'd single-pass
    * replace/regexp steps, mirrored operation-for-operation by the SQL
    * oracle. A bare "%" not followed by two hex digits is malformed per
    * the RFC; both hex passes require the full two-hex-digit shape
    * before rewriting, and inside [[urlNormalize]] such URLs never
    * reach this point anyway (try_parse_url rejects them → NULL).
    *
    * `private[graft]` deliberately: on MALFORMED input the
    * unreserved-decode pass can SYNTHESIZE a new escape ("%2%34" →
    * "%2" + "4" = "%24" — decoding %34 created a valid-looking %24
    * that was never in the input), changing the string's
    * percent-decoded meaning. Callers must pre-validate escapes the
    * way [[urlNormalize]] does (the try_parse_url gate); that is
    * stronger than "malformed % left alone", so the method is not
    * part of the public surface. */
  private[graft] def pctNormalize(s: Column): Column =
    graft.functions.functions.pct_normalize(s)

  /** The ORIGINAL 12-regexp + 62-replace column chain, kept as the
    * differential-test twin of the codegen kernel that replaced it
    * ([[graft.functions.PctNormalizeAlgo]] — the chain, applied twice
    * inside [[urlNormalize]], pushed the projection out of whole-stage
    * codegen and its Catalyst-analysis cost dominated small inputs;
    * NOTES round 17). WebSpec pins kernel == chain on adversarial
    * escape soup, well-formed and malformed alike. */
  private[graft] def pctNormalizeChain(s: Column): Column = {
    // first hex digit: %xY → %XY (second digit must be hex — a lone
    // "%x" before a non-hex character is malformed and left alone)
    val upFirst = HexLetters.foldLeft(s)((acc, c) =>
      regexp_replace(acc, s"%$c([0-9A-Fa-f])", s"%${c.toUpper}" + "$1"))
    // second hex digit: %Xy → %XY (first digit canonical after pass 1)
    val up = HexLetters.foldLeft(upFirst)((acc, c) =>
      regexp_replace(acc, s"%([0-9A-F])$c", "%$1" + c.toUpper))
    UnreservedDecodes.foldLeft(up) { case (acc, (esc, ch)) =>
      replace(acc, lit(esc), lit(ch))
    }
  }

  /** Normalize a URL for identity comparison:
    *  - scheme and host lowercased (host escapes don't occur here:
    *    try_parse_url rejects a %-escape in the authority outright, so
    *    such URLs normalize to NULL like any other unparseable input;
    *    path case is PRESERVED — paths are case-sensitive on most
    *    origins);
    *  - default ports dropped (http:80, https:443), explicit
    *    non-default ports kept;
    *  - fragment dropped (never sent to the origin);
    *  - percent-encoding canonicalized in path and query
    *    ([[pctNormalize]]: escape hex uppercased, unreserved-character
    *    escapes decoded) — "%7Euser" and "~user" are one page;
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
    // no pctNormalize on the host — PROBED: try_parse_url rejects any
    // %-escape in the authority outright (the whole URL parses to
    // NULL), so an escaped host never reaches normalization; it is
    // quarantined upstream exactly like a malformed path escape
    // (WebSpec pins the rejection)
    val host = lower(try_parse_url(u, lit("HOST")))
    val port = regexp_extract(u,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/:?#]+:(\\d+)", 1)
    val path = regexp_replace(pctNormalize(
      coalesce(try_parse_url(u, lit("PATH")), lit(""))), "/+$", "")
    // escapes canonicalized BEFORE the tracker filter, so an escaped
    // spelling of a tracker name ("%75tm_source") cannot slip past it
    val q = pctNormalize(coalesce(try_parse_url(u, lit("QUERY")), lit("")))
    // tracker filter as a codegen kernel — the split/filter/array_join
    // HOF lambda it replaces can never compile (no doGenCode on
    // collection HOFs) and alone pushed this projection out of
    // whole-stage codegen ([[graft.functions.StripTrackersAlgo]];
    // WebSpec pins kernel == lambda)
    val qn = graft.functions.functions.strip_trackers(q)
    val portPart = when(port === "" ||
        (proto === "http" && port === "80") ||
        (proto === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    when(proto.isNull || host.isNull || proto === "" || host === "",
        lit(null).cast("string"))
      .otherwise(concat(proto, lit("://"), host, portPart, path,
        when(qn === "", lit("")).otherwise(concat(lit("?"), qn))))
  }

  /** The lowercased host of a URL (no port), NULL when unparseable
    * (incl. any %-escape in the authority — try_parse_url rejects
    * those whole, see [[urlNormalize]]). */
  def urlHost(u: Column): Column = {
    val h = lower(try_parse_url(u, lit("HOST")))
    when(h === "", lit(null).cast("string")).otherwise(h)
  }

  /** Multi-part public suffixes recognized by [[registeredDomain]] —
    * a built-in static subset of the well-known ccTLD second-level
    * registries (the full public-suffix list is a network-fetched
    * artifact; this engine is zero-egress, so the vendored set is
    * explicit and the caller can see exactly what it covers). The SQL
    * oracle's IN-list is generated from this same Seq, so the two
    * engines can never drift. */
  val MultiPartTlds: Seq[String] = Seq(
    // United Kingdom
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk",
    "plc.uk", "sch.uk", "nhs.uk",
    // Japan
    "co.jp", "or.jp", "ne.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "gr.jp", "lg.jp",
    // Australia / New Zealand
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    // India
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "ac.in",
    "edu.in", "gov.in", "res.in",
    // Brazil / Mexico / Argentina and wider Latin America
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.mx", "org.mx", "net.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    "com.co", "com.pe", "com.ve", "com.uy", "com.ec", "com.bo",
    "com.py", "com.do", "com.gt", "com.ni", "com.pa", "com.sv",
    // China / Taiwan / Hong Kong / Korea
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.tw", "org.tw", "net.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "co.kr", "or.kr", "ne.kr", "re.kr", "pe.kr", "go.kr", "ac.kr",
    // Southeast Asia
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    "co.id", "or.id", "ac.id", "go.id", "web.id", "sch.id", "net.id",
    "my.id", "biz.id",
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    "co.th", "or.th", "ac.th", "go.th", "in.th", "net.th",
    // Turkey / Israel / Middle East / Africa
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr",
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il",
    "com.eg", "com.sa", "com.pk", "com.bd", "com.ng",
    "co.za", "org.za", "net.za", "gov.za", "ac.za", "web.za",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke",
    "co.tz", "co.ug", "co.zw", "co.bw", "co.zm",
    // Eastern Europe / Central & South Asia
    "com.ua", "in.ua", "com.pl", "net.pl", "org.pl", "edu.pl",
    "com.np", "org.np", "edu.np", "gov.np",
    "com.lk", "org.lk", "edu.lk", "gov.lk")

  /** The registrable domain of a host: the last two labels, or the
    * last three when the last two form a recognized multi-part public
    * suffix ([[MultiPartTlds]]) — "news.bbc.co.uk" → "bbc.co.uk",
    * "a.b.example.com" → "example.com". Hosts with ≤ 2 labels pass
    * through unchanged, and so do IP literals — detected BEFORE the
    * label logic (digits-and-dots for IPv4, a leading "[" for bracketed
    * IPv6), since an IPv4 host has 4 labels and the last-two-labels
    * rule would otherwise collapse every pair of addresses sharing
    * their final octets into one domain-mixing key. The domain-mixing
    * key for [[Corpus.mixtureSample]]. */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".",
      element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".", element_at(labels, -3),
      element_at(labels, -2), element_at(labels, -1))
    when(host.isNull, lit(null).cast("string"))
      .when(host.rlike("^[0-9.]+$") || host.startsWith("["), host)
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
