package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Lowercased scheme://host with default port and www. stripped.
    * The port strip is SCHEME-AWARE: an explicit `:443` is the default
    * only for https (`http://host:443` is a distinct origin and must
    * survive canonicalization), and `:80` only for http. A CASE over the
    * scheme prefix plus a plain suffix delete keeps every rule
    * backreference-free, so the DuckDB oracle twin stays rule-for-rule
    * identical (RE2 has no lookbehind to express this in one regex). */
  private def normSchemeHost(url: Column): Column = {
    val sh = lower(regexp_extract(url, "^([^:/]+://[^/?#]+)", 1))
    val noPort =
      when(sh.startsWith("https://"), regexp_replace(sh, ":443$", ""))
        .when(sh.startsWith("http://"), regexp_replace(sh, ":80$", ""))
        .otherwise(sh)
    regexp_replace(noPort, "://www\\.", "://")
  }

  /** Everything after scheme://host, canonicalized. */
  private def normRest(url: Column): Column = {
    val sh = regexp_extract(url, "^([^:/]+://[^/?#]+)", 1)
    val rest = url.substr(length(sh) + 1, lit(1 << 20))
    val noFrag = regexp_replace(rest, "#.*$", "")
    // \b anchors the param NAME start: without it `ref=` matches inside
    // longer names (`?aref=1&b=2` would canonicalize to `?ab=2`, splicing
    // the remainder onto the preceding name and merging distinct URLs
    // under one dedup key). ASCII \b is supported identically by Java
    // regex and RE2, keeping the rule backreference-free and
    // oracle-identical.
    val noTrack = regexp_replace(noFrag,
      "\\b(utm_[A-Za-z]+|fbclid|gclid|ref)=[^&#]*&?", "")
    val noDangle = regexp_replace(noTrack, "[?&]+$", "")
    regexp_replace(noDangle, "/$", "")
  }

  /** The canonical URL (see object doc for the rule set). */
  def canonicalize(url: Column): Column =
    concat(normSchemeHost(url), normRest(url))

  /** Host of an already-canonical URL. */
  def host(canon: Column): Column =
    regexp_extract(canon, "^[a-z]+://([^/:?#]+)", 1)

  /** Registered domain = last two host labels — the pure-expression
    * HEURISTIC (wrong for `co.uk`-class multi-label public suffixes;
    * [[withRegisteredDomain]] is the suffix-table form a blocklist should
    * key on). Kept for contexts that need a scalar column with no join. */
  def registeredDomain(hostCol: Column): Column =
    regexp_extract(hostCol, "([^.]+\\.[^.]+)$", 1)

  /** Trimmed public-suffix list — a FIXTURE standing in for the full
    * publicsuffix.org table (~10k entries), which ships the same way in
    * production: a broadcast list, identical plan shape, just longer.
    * Multi-label entries cover the ccTLD classes the 2-label heuristic
    * gets wrong (`example.co.uk`'s registered domain is the 3-label
    * `example.co.uk`, not `co.uk`). */
  val PublicSuffixes: Seq[String] = Seq(
    // 1-label (generic TLDs + bare ccTLDs): registered domain = 2 labels
    "com", "org", "net", "edu", "gov", "mil", "int", "io", "co", "ai",
    "dev", "app", "info", "biz", "uk", "jp", "au", "br", "in", "nz",
    "mx", "kr", "cn", "fr", "de", "it", "nl", "es", "se", "ch", "pl",
    // 2-label public suffixes: registered domain = 3 labels
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "me.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gen.in",
    "co.nz", "net.nz", "org.nz",
    "com.mx", "org.mx", "gob.mx",
    "co.kr", "or.kr", "go.kr",
    "com.cn", "net.cn", "org.cn", "gov.cn")

  /** Adds `outCol` = registered domain of `hostCol`, resolved against
    * [[PublicSuffixes]] longest-suffix-first: the host's last-2-label
    * candidate is tried against the 2-label suffixes, then its last
    * label against the 1-label suffixes; the first match wins and the
    * registered domain is one more label than the matched suffix.
    * Unmatched hosts (unknown TLD) fall back to the 2-label heuristic.
    *
    * Scale shape: two BROADCAST left joins against the tiny suffix table
    * — the host side never shuffles, and the full publicsuffix.org list
    * still broadcasts trivially. Expressible verbatim in the DuckDB
    * oracle (t43) as two LEFT JOINs over unnest'd lists. */
  def withRegisteredDomain(df: DataFrame, hostCol: String,
                           outCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val suf2 = broadcast(
      PublicSuffixes.filter(_.contains('.')).toDF("_sfx2"))
    val suf1 = broadcast(
      PublicSuffixes.filterNot(_.contains('.')).toDF("_sfx1"))
    val h = col(hostCol)
    df.withColumn("_last1", regexp_extract(h, "([^.]+)$", 1))
      .withColumn("_last2", regexp_extract(h, "([^.]+\\.[^.]+)$", 1))
      .withColumn("_last3", regexp_extract(h, "([^.]+\\.[^.]+\\.[^.]+)$", 1))
      .join(suf2, col("_last2") === col("_sfx2"), "left")
      .join(suf1, col("_last1") === col("_sfx1"), "left")
      .withColumn(outCol,
        when(col("_sfx2").isNotNull && col("_last3") =!= "", col("_last3"))
          .when(col("_sfx1").isNotNull && col("_last2") =!= "", col("_last2"))
          .otherwise(col("_last2"))) // unknown TLD: 2-label heuristic
      .drop("_last1", "_last2", "_last3", "_sfx1", "_sfx2")
  }
}
