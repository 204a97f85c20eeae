package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * URL canonicalization — the first dedup pass of every web-scale
 * corpus pipeline (one page is crawled under dozens of spellings:
 * tracking params, fragments, www/case/port variants, trailing
 * slashes). Canonicalizing BEFORE content dedup removes the bulk of
 * exact duplicates with a single narrow-key hash aggregate instead of
 * a text-shingling pass — at 100 TB the canonical-url groupBy
 * shuffles ~60 bytes/row against the document body's kilobytes.
 *
 * Everything is composed from codegen'd string expressions (regexp
 * extract/replace + array ops, no UDF), and every rule has a DuckDB
 * mirror ([[urlCanonicalizeSql]]) so canonical forms are
 * oracle-hashable. Rules (RFC 3986 §6 normalizations plus the
 * standard tracking-param strip):
 *
 *  1. drop the fragment (`#...` — client-side only);
 *  2. lowercase the scheme and host (case-insensitive per RFC);
 *  3. strip a leading `www.`;
 *  4. strip the scheme's default port (`:80` http, `:443` https);
 *  5. collapse trailing slashes on the path; empty path → `/`;
 *  6. drop tracking query params (`utm_*`, `fbclid`, `gclid`,
 *     `msclkid`, `ref`), sort the survivors byte-wise, and re-join —
 *     param ORDER never distinguishes two URLs.
 */
object UrlOps {

  private val TrackRe = "^(utm_[^=]*|fbclid|gclid|msclkid|ref)="

  /** The canonical form of `u` under the rules above. Non-URL input
    * (no `scheme://`) canonicalizes to `://` + leftovers — callers
    * filter or treat it as its own key; nothing throws. */
  def urlCanonicalize(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host0 = regexp_replace(
      lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)),
      "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
    val path0 = regexp_replace(
      regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1),
      "/+$", "")
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val kept = array_join(array_sort(filter(
      split(regexp_extract(noFrag, "\\?([^#]*)", 1), "&"),
      p => !(p.rlike(TrackRe) || p === lit("")))), "&")
    concat(scheme, lit("://"), host, path,
      when(kept === "", lit("")).otherwise(concat(lit("?"), kept)))
  }

  /** DuckDB mirror of [[urlCanonicalize]] over the SQL expression
    * `u` — identical rule order, so canonical strings hash-match. */
  def urlCanonicalizeSql(u: String): String = {
    val noFrag = s"regexp_replace($u, '#.*$$', '')"
    val scheme = s"lower(regexp_extract($noFrag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    val host0 = s"regexp_replace(lower(regexp_extract($noFrag, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)), '^www\\.', '')"
    val host =
      s"""CASE WHEN $scheme = 'http' THEN regexp_replace($host0, ':80$$', '')
         |     WHEN $scheme = 'https' THEN regexp_replace($host0, ':443$$', '')
         |     ELSE $host0 END""".stripMargin.replaceAll("\\s*\\n\\s*", " ")
    val path0 = s"regexp_replace(regexp_extract($noFrag, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/+$$', '')"
    val path = s"CASE WHEN $path0 = '' THEN '/' ELSE $path0 END"
    // COALESCE: DuckDB's array_to_string over an EMPTY list is NULL,
    // Spark's array_join is '' — the empty-query case must agree
    val kept = s"""COALESCE(array_to_string(list_sort(list_filter(
                  |  string_split(regexp_extract($noFrag, '\\?([^#]*)', 1), '&'),
                  |  p -> NOT (regexp_matches(p, '$TrackRe') OR p = ''))), '&'), '')""".stripMargin.replaceAll("\\s*\\n\\s*", " ")
    // single-line output: callers interpolate this into stripMargin'd
    // templates, which would mangle any line starting with `||`
    s"($scheme || '://' || $host || $path || " +
      s"CASE WHEN $kept = '' THEN '' ELSE '?' || $kept END)"
  }

  /** Canonical host (post-rules 2–4) — the per-domain partitioning /
    * rate-limit / quality-prior key of a crawl pipeline. */
  def urlHost(u: Column): Column = {
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host0 = regexp_replace(
      lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)),
      "^www\\.", "")
    when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
  }

  /** Registered domain heuristic: the last two host labels (public-
    * suffix lists are a lookup table in production; two labels is the
    * standard offline approximation). */
  def urlRegisteredDomain(u: Column): Column =
    regexp_extract(urlHost(u), "([^.]+\\.[^.]+)$", 1)

  /** DuckDB mirror of [[urlHost]]. */
  def urlHostSql(u: String): String = {
    val scheme = s"lower(regexp_extract($u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    val host0 = s"regexp_replace(lower(regexp_extract($u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)), '^www\\.', '')"
    s"""(CASE WHEN $scheme = 'http' THEN regexp_replace($host0, ':80$$', '')
       |      WHEN $scheme = 'https' THEN regexp_replace($host0, ':443$$', '')
       |      ELSE $host0 END)""".stripMargin.replaceAll("\\s*\\n\\s*", " ")
  }

  /** DuckDB mirror of [[urlRegisteredDomain]]. */
  def urlRegisteredDomainSql(u: String): String =
    s"regexp_extract(${urlHostSql(u)}, '([^.]+\\.[^.]+)$$', 1)"
}
