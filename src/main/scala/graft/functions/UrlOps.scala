package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the web-corpus dedup key (CommonCrawl-style
  * pipelines dedupe and filter by canonical URL/host before any content
  * pass; the reference's id-or-hash identity, `app/main.py:130-140`, is
  * the same "stable key from messy input" problem one level up).
  *
  * All pure column expressions (codegen'd, zero UDFs) and deliberately
  * backreference-free: Spark's regexp_replace uses Java `$1` replacement
  * syntax while DuckDB/RE2 uses `\1`, so any rule needing a capture in
  * the replacement could not be oracle-checked verbatim. Every rule here
  * is a plain delete/rewrite, identical in both engines.
  *
  * Canonical form: lowercase scheme+host, default ports stripped,
  * `www.` stripped, fragment dropped, tracking params (utm_*, fbclid,
  * gclid, ref) dropped with separators repaired, trailing `/` and empty
  * `?` stripped. Path case is preserved (paths are case-sensitive).
  */
object UrlOps {

  /** Lowercased scheme://host with default port and www. stripped. */
  private def normSchemeHost(url: Column): Column = {
    val sh = regexp_extract(url, "^([^:/]+://[^/?#]+)", 1)
    regexp_replace(
      regexp_replace(lower(sh), ":(443|80)$", ""),
      "://www\\.", "://")
  }

  /** Everything after scheme://host, canonicalized. */
  private def normRest(url: Column): Column = {
    val sh = regexp_extract(url, "^([^:/]+://[^/?#]+)", 1)
    val rest = url.substr(length(sh) + 1, lit(1 << 20))
    val noFrag = regexp_replace(rest, "#.*$", "")
    val noTrack = regexp_replace(noFrag,
      "(utm_[A-Za-z]+|fbclid|gclid|ref)=[^&#]*&?", "")
    val noDangle = regexp_replace(noTrack, "[?&]+$", "")
    regexp_replace(noDangle, "/$", "")
  }

  /** The canonical URL (see object doc for the rule set). */
  def canonicalize(url: Column): Column =
    concat(normSchemeHost(url), normRest(url))

  /** Host of an already-canonical URL. */
  def host(canon: Column): Column =
    regexp_extract(canon, "^[a-z]+://([^/:?#]+)", 1)

  /** Registered domain = last two host labels (the blocklist key; a
    * production build swaps in a public-suffix table via broadcast join —
    * same plan shape, longer suffix list). */
  def registeredDomain(hostCol: Column): Column =
    regexp_extract(hostCol, "([^.]+\\.[^.]+)$", 1)
}
