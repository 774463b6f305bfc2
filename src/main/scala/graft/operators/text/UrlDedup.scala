package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL normalization + URL-level deduplication — the C4/RefinedWeb
  * first-stage rule: before any content-based dedup, collapse crawl
  * records that are the same page fetched under cosmetically different
  * URLs. [[normalize]] canonicalizes:
  *
  *   - scheme stripped (`http://` vs `https://` vs case variants)
  *   - host lowercased, leading `www.` and default ports `:80`/`:443`
  *     dropped — path/query case is PRESERVED (path case is significant
  *     on most origins; host case never is, RFC 3986 §6.2.2.1)
  *   - fragment dropped (`#…` never reaches the server)
  *   - tracking query parameters dropped (`utm_*`, `ref`, `fbclid`,
  *     `gclid` — the RefinedWeb/CCNet strip list); other parameters are
  *     kept byte-for-byte, and a query left empty disappears with its
  *     `?`
  *   - trailing slashes stripped from the path
  *
  * The whole normalization is one codegen'd column expression (regexp
  * over the RE2-compatible subset, array ops for the parameter filter —
  * no UDF), so it rides inside whole-stage codegen next to the scan.
  *
  * [[run]] then keeps the lowest doc id per normalized URL. Scale
  * shape: the only exchange is the one hash shuffle on `norm_url` for
  * the per-group window — there is no join, and the window's
  * min-over-group never buffers a group (rank-less aggregate window).
  * At 100 TB the normalized URL is the natural partition key; heavy
  * hitters (a hot URL crawled millions of times) stay a single group by
  * contract — per-URL group size is crawl-frequency-bounded, not
  * corpus-bounded.
  *
  * Output (one row per input document):
  * `(doc_id, norm_url, is_canonical, n_group)`.
  */
object UrlDedup {

  private val TrackingParam = "^(utm_[^=]*|ref|fbclid|gclid)="

  /** Canonical form of a URL column. See class doc for the rules. */
  def normalize(url: Column): Column = {
    // optional scheme so protocol-relative '//host/path' URLs
    // canonicalize with their absolute twins
    val noScheme = regexp_replace(url, "^([A-Za-z][A-Za-z0-9+.-]*:)?//", "")
    val hostport = regexp_extract(noScheme, "^[^/?#]*", 0)
    val host = regexp_replace(
      regexp_replace(lower(hostport), "^www\\.", ""), ":(80|443)$", "")
    val rest = noScheme.substr(length(hostport) + 1, lit(Int.MaxValue))
    val noFrag = regexp_replace(rest, "#.*$", "")
    val rawPath = regexp_extract(noFrag, "^[^?]*", 0)
    val path = regexp_replace(rawPath, "/+$", "")
    // substring past the end is '' on both engines → no conditional
    val rawQuery = noFrag.substr(length(rawPath) + 2, lit(Int.MaxValue))
    val query = array_join(
      filter(split(rawQuery, "&"),
        p => p =!= "" && !p.rlike(TrackingParam)), "&")
    concat(host, path,
      when(query === "", lit("")).otherwise(concat(lit("?"), query)))
  }

  /** Dedup by normalized URL; canonical = lowest id in the group. */
  def run(df: DataFrame, urlCol: String = "url", idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy("norm_url")
    df.select(col(idCol), normalize(col(urlCol)).as("norm_url"))
      .withColumn("is_canonical", col(idCol) === min(col(idCol)).over(w))
      .withColumn("n_group", count(lit(1)).over(w))
      .orderBy(idCol)
  }

  /** DuckDB twin of [[run]] over `table(doc_id, url)`. One divergence
    * papered over: `array_to_string` of an EMPTY list is NULL in DuckDB
    * where Spark's `array_join` is `''` — the `coalesce` keeps the two
    * engines byte-identical on tracking-only queries.
    */
  def oracleSql(table: String): String =
    s"""WITH parts AS (
       |  SELECT doc_id,
       |    regexp_replace(url, '^([A-Za-z][A-Za-z0-9+.-]*:)?//', '') AS ns
       |  FROM $table),
       |split1 AS (
       |  SELECT doc_id, regexp_extract(ns, '^[^/?#]*') AS hostport,
       |    regexp_replace(substring(ns, len(regexp_extract(ns, '^[^/?#]*')) + 1),
       |      '#.*$$', '') AS nofrag
       |  FROM parts),
       |split2 AS (
       |  SELECT doc_id,
       |    regexp_replace(regexp_replace(lower(hostport), '^www\\.', ''),
       |      ':(80|443)$$', '') AS host,
       |    regexp_extract(nofrag, '^[^?]*') AS rawpath,
       |    substring(nofrag, len(regexp_extract(nofrag, '^[^?]*')) + 2) AS rawquery
       |  FROM split1),
       |norm AS (
       |  SELECT doc_id,
       |    host || regexp_replace(rawpath, '/+$$', '') ||
       |    CASE WHEN q = '' THEN '' ELSE '?' || q END AS norm_url
       |  FROM (
       |    SELECT doc_id, host, rawpath,
       |      coalesce(array_to_string(list_filter(string_split(rawquery, '&'),
       |        p -> p <> '' AND NOT regexp_matches(p, '^(utm_[^=]*|ref|fbclid|gclid)=')),
       |        '&'), '') AS q
       |    FROM split2))
       |SELECT doc_id, norm_url,
       |  doc_id = min(doc_id) OVER (PARTITION BY norm_url) AS is_canonical,
       |  count(*) OVER (PARTITION BY norm_url) AS n_group
       |FROM norm
       |ORDER BY doc_id""".stripMargin
}
