package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus URL operators: canonicalization and URL-keyed dedup.
  *
  * URL dedup is the cheapest hygiene pass in a web-crawl curation
  * pipeline (RefinedWeb, Penedo et al. 2023 §3.1, runs it before any
  * content-based dedup; CCNet dedups per-URL shards the same way): the
  * same page is crawled many times under trivially-different spellings —
  * scheme/host case, default ports, `www.` prefixes, fragments, tracking
  * parameters, query-parameter order, duplicate or trailing slashes —
  * and collapsing those BEFORE MinHash/Jaccard removes the bulk of
  * byte-identical pages for the cost of row-local string work plus one
  * hash shuffle on the canonical key.
  *
  * [[canonicalizeUrl]] is a pure Column composition (regexp + array
  * higher-order functions, no UDF): at 100 TB it runs row-local inside
  * the scan stage, and only the groupBy on the canonical key shuffles.
  * The transform is idempotent (canon(canon(u)) == canon(u)) — specs
  * assert it — so re-running the pass over an already-cleaned corpus is
  * a no-op rather than a corruption.
  */
object Web {

  /** Query parameters dropped during canonicalization: click/campaign
    * trackers that never change page content (the RefinedWeb list). */
  val TrackingParams = "^(utm_[^=]*|fbclid|gclid|ref)="

  /** RFC 3986 syntax-based normalization (§6.2.2) plus the standard
    * crawl-dedup extensions:
    *   - scheme and host lowercased; userinfo-free hosts assumed
    *   - default ports stripped (`:80` for http, `:443` for https)
    *   - leading `www.` stripped
    *   - duplicate path slashes collapsed; trailing slash stripped
    *     (except the root path); empty path becomes `/`
    *   - fragment dropped
    *   - tracking query params dropped ([[TrackingParams]]); remaining
    *     params sorted byte-wise and re-joined
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostRaw =
      lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val hostNoPort = when(scheme === "http",
        regexp_replace(hostRaw, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostRaw, ":443$", ""))
      .otherwise(hostRaw)
    // "(www\\.)+" not "www\\." — stacked prefixes (www.www.x) must strip
    // in ONE pass or canonicalization loses idempotence
    val host = regexp_replace(hostNoPort, "^(www\\.)+", "")
    val pathRaw =
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val pathCollapsed = regexp_replace(pathRaw, "/{2,}", "/")
    val path = when(pathCollapsed === "", lit("/"))
      .otherwise(regexp_replace(pathCollapsed, "(.+)/$", "$1"))
    val queryRaw = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = array_sort(filter(split(queryRaw, "&"),
      p => !p.rlike(TrackingParams) && p =!= ""))
    val query = array_join(kept, "&")
    concat(scheme, lit("://"), host, path,
      when(query =!= "", concat(lit("?"), query)).otherwise(lit("")))
  }

  /** The DuckDB spelling of [[canonicalizeUrl]] over a column expression
    * `u` — kept adjacent to the Spark composition so the two transforms
    * evolve together. Emitted as one nested scalar expression so callers
    * can splice it straight into a projection. DuckDB's regexp_replace
    * is first-match by default (Spark's is global), hence the explicit
    * 'g' flag on the slash-collapse; anchored patterns match at most
    * once so the rest are flag-free. */
  def canonicalizeUrlSql(u: String): String = {
    val scheme =
      s"lower(coalesce(regexp_extract($u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1), ''))"
    val hostRaw =
      s"lower(coalesce(regexp_extract($u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), ''))"
    val hostNoPort =
      s"""(CASE WHEN $scheme = 'http'
                THEN regexp_replace($hostRaw, ':80$$', '')
              WHEN $scheme = 'https'
                THEN regexp_replace($hostRaw, ':443$$', '')
              ELSE $hostRaw END)"""
    val host = s"regexp_replace($hostNoPort, '^(www\\.)+', '')"
    val pathRaw =
      s"coalesce(regexp_extract($u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '')"
    val pathCollapsed = s"regexp_replace($pathRaw, '/{2,}', '/', 'g')"
    val path =
      s"""(CASE WHEN $pathCollapsed = '' THEN '/'
               ELSE regexp_replace($pathCollapsed, '(.+)/$$', '\\1') END)"""
    val query =
      s"""array_to_string(list_sort(list_filter(
            string_split(coalesce(regexp_extract($u, '\\?([^#]*)', 1), ''), '&'),
            p -> NOT regexp_matches(p, '$TrackingParams') AND p <> '')), '&')"""
    s"""($scheme || '://' || $host || $path ||
         (CASE WHEN $query <> '' THEN '?' || $query ELSE '' END))"""
  }

  /** URL-keyed dedup census: canonical URL → duplicate count + the kept
    * (minimum) id. Row-local canonicalization, ONE hash shuffle. */
  def urlDedup(df: DataFrame, urlCol: String, idCol: String): DataFrame =
    df.groupBy(canonicalizeUrl(col(urlCol)).as("canonical_url"))
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("keep_id"))
}
