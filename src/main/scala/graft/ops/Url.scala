package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the crawl-frontier dedup key. A crawler
  * sees the same resource under many spellings (scheme/host case,
  * default ports, `www.` prefixes, duplicate path slashes, tracking
  * parameters, fragments, query-parameter order); fetching each
  * spelling re-crawls the page and re-admits its text downstream, so
  * frontier dedup keys on a canonical form. The rules here are the
  * standard RFC 3986 §6 normalizations plus the two de-facto crawl
  * rules every pipeline adds (strip `www.`, strip `utm_*` tracking
  * params):
  *
  *   1. scheme and host lowercase (case-insensitive by spec; paths
  *      and query values are NOT touched — they are case-sensitive);
  *   2. default port dropped (`:443` under https, `:80` under http);
  *   3. leading `www.` dropped from the host;
  *   4. duplicate path slashes collapsed;
  *   5. fragment dropped (never sent to the server);
  *   6. `utm_*` query parameters dropped, remaining parameters
  *      sorted (param order is almost never semantic; sorting makes
  *      the key order-invariant).
  *
  * Everything is a chain of codegen'd regexp/array expressions — one
  * map pass, no UDF, no shuffle: canonicalizing 10¹² frontier URLs at
  * 100 TB is a linear scan, and the dedup that follows is the plain
  * exact-dedup hash aggregate (q30's shape) on the canonical column.
  * Each rule is mirrored verbatim by the DuckDB oracle (same regexes,
  * same split-filter-sort-join; ASCII-only syntax, so Java and RE2
  * regex semantics and both engines' binary string sort agree). */
object Url {

  /** Politeness spacing between same-host fetches (q199's schedule;
    * the conservative default a crawler uses when robots.txt names
    * no Crawl-delay). */
  val CrawlDelaySec = 10L

  /** The URL's scheme, lowercased ("" when the input has none). */
  def urlScheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** The URL's authority (host[:port]), lowercased. */
  def urlAuthority(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))

  /** The canonical HOST: authority lowercased, default port for the
    * URL's scheme dropped, leading `www.` dropped. */
  def urlHost(url: Column): Column = {
    val auth = urlAuthority(url)
    val noPort = when(urlScheme(url) === "https", regexp_replace(auth, ":443$", ""))
      .when(urlScheme(url) === "http", regexp_replace(auth, ":80$", ""))
      .otherwise(auth)
    regexp_replace(noPort, "^www\\.", "")
  }

  /** Path component (may be ""), duplicate slashes collapsed. */
  def urlPath(url: Column): Column =
    regexp_replace(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1),
      "/{2,}", "/")

  /** Query string without the `?` (may be ""), `utm_*` params
    * dropped, remaining params sorted. */
  def urlQuery(url: Column): Column = {
    val qs = regexp_extract(url, "\\?([^#]*)", 1)
    array_join(
      array_sort(filter(split(qs, "&"),
        p => p =!= "" && p.substr(lit(1), lit(4)) =!= "utm_")),
      "&")
  }

  /** The full canonical form (rules 1-6 above). Input must be an
    * absolute http(s)-style URL; anything else canonicalizes to a
    * deterministic best-effort (empty scheme/host extract as ""). */
  def canonicalizeUrl(url: Column): Column = {
    val q = urlQuery(url)
    concat(
      urlScheme(url), lit("://"), urlHost(url), urlPath(url),
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }
}
