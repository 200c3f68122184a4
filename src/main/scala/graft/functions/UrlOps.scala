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

  /** One parsed publicsuffix.org rule: `labels` label count; exactly one
    * of the three kinds is set. For a WILDCARD rule (`*.ck`) the stored
    * string is the BASE (`ck`, the part after `*.`) — the rule's suffix
    * is one label deeper than the base. For an EXCEPTION (`!www.ck`) the
    * stored string is the rule body (`www.ck`), which per the PSL
    * algorithm IS the registered domain of every host it suffix-matches
    * (prevailing rule = exception minus its leading label). */
  private final case class PslRule(rule: String, labels: Int,
                                   exact: Boolean, wildcard: Boolean,
                                   exception: Boolean)

  /** The FULL publicsuffix.org rule set (ICANN + private sections),
    * vendored as a resource from the OS-distributed copy of
    * `public_suffix_list.dat` (Mozilla Public Suffix List, MPL 2.0 — the
    * same file Debian ships in /usr/share/publicsuffix and the JDK embeds
    * for cookie scoping). ~9.5k rules: exact suffixes up to 5 labels,
    * leading-`*.` wildcards with bases up to 4 labels, 8 `!` exceptions.
    *
    * Internationalized rules (the list carries U-labels like `公司.cn`)
    * additionally emit a punycode twin via [[java.net.IDN]] — web-corpus
    * hosts are IDNA-encoded (`xn--`), so without the twin every IDN
    * registry would silently fall back to the 2-label heuristic. */
  private lazy val FullPslRules: Seq[PslRule] = {
    val in = getClass.getResourceAsStream("/public_suffix_list.dat")
    require(in != null, "public_suffix_list.dat resource missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    val raw =
      try src.getLines()
        .map(_.trim.takeWhile(c => !c.isWhitespace)) // rule ends at whitespace (PSL spec)
        .filter(l => l.nonEmpty && !l.startsWith("//"))
        .toVector
      finally src.close()
    def asciiTwin(r: String): Option[String] = {
      val (pfx, body) = if (r.startsWith("!")) ("!", r.drop(1)) else ("", r)
      try {
        val t = pfx + body.split('.')
          .map(l => if (l == "*") l else java.net.IDN.toASCII(l).toLowerCase)
          .mkString(".")
        if (t == r) None else Some(t)
      } catch { case _: IllegalArgumentException => None }
    }
    (raw ++ raw.flatMap(asciiTwin)).distinct.map { r =>
      if (r.startsWith("!")) {
        val body = r.drop(1)
        PslRule(body, body.count(_ == '.') + 1, exact = false,
          wildcard = false, exception = true)
      } else if (r.startsWith("*.")) {
        val base = r.drop(2)
        PslRule(base, base.count(_ == '.') + 1, exact = false,
          wildcard = true, exception = false)
      } else
        PslRule(r, r.count(_ == '.') + 1, exact = true,
          wildcard = false, exception = false)
    }
  }

  /** Last `n` dot-labels of the host, or '' when the host is shorter. */
  private def lastLabels(h: Column, n: Int): Column =
    regexp_extract(h, "([^.]+" + ("\\.[^.]+" * (n - 1)) + ")$", 1)

  /** [[withRegisteredDomain]] against the FULL vendored publicsuffix.org
    * list, implementing the complete PSL algorithm — exact rules at every
    * depth, `*.`-wildcard rules, and `!` exceptions — instead of the
    * 1/2-label fixture subset:
    *
    *   - an EXCEPTION rule that suffix-matches prevails over everything;
    *     the registered domain is the exception body itself;
    *   - otherwise the longest matching rule prevails (a wildcard rule
    *     counts its `*`), and the registered domain is one label more
    *     than the matched suffix;
    *   - no rule matches → implicit `*` rule: the 2-label heuristic.
    *
    * Divergence from the spec, deliberately total: a host that IS a
    * public suffix (`nom.br` under `*.nom.br`) has no registered domain
    * per spec; this column falls through to the next-longest match and
    * ultimately the 2-label heuristic, so the dedup key is never null.
    *
    * Scale shape: ONE broadcast hash join per rule depth (5 with today's
    * list) against depth-partitioned slices of the ~9.5k-row rule table,
    * resolved by a single precedence CASE — the host side never shuffles
    * and the whole rule set broadcasts in ~250 KB, the same plan family
    * as the fixture form (t43), just wider. */
  def withRegisteredDomainPsl(df: DataFrame, hostCol: String,
                              outCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val byDepth = FullPslRules.groupBy(_.labels)
    val maxSuffix = byDepth.keys.max + 1 // deepest wildcard suffix = base+1
    val h = col(hostCol)
    val withLasts = (1 to (maxSuffix + 1)).foldLeft(df) { (d, n) =>
      d.withColumn(s"_last$n", lastLabels(h, n))
    }
    // one broadcast join per rule depth: (rule, exact?, wildcard?, exc?)
    // — a string can be several kinds at once (`nom.br` is an exact rule
    // AND the base of `*.nom.br`), so kinds are OR-folded per rule
    val joined = byDepth.toSeq.sortBy(_._1).foldLeft(withLasts) {
      case (d, (depth, rules)) =>
        val tbl = rules.groupBy(_.rule).map { case (r, rs) =>
          (r, rs.exists(_.exact), rs.exists(_.wildcard),
            rs.exists(_.exception))
        }.toSeq.toDF(s"_rule_$depth", s"_ex_$depth", s"_wc_$depth",
          s"_xc_$depth")
        d.join(broadcast(tbl),
          col(s"_last$depth") === col(s"_rule_$depth"), "left")
    }
    def has(flag: String, depth: Int): Column =
      if (byDepth.contains(depth)) col(s"_${flag}_$depth") === true
      else lit(false)
    val depths = byDepth.keys.toSeq.sorted.reverse
    val candidates =
      // exceptions first (deepest first): rd = the matched labels
      depths.map(dp => when(has("xc", dp), col(s"_last$dp"))) ++
      // then longest suffix: exact depth s, then wildcard base depth s-1
      (maxSuffix to 1 by -1).flatMap { s =>
        Seq(when(has("ex", s) && col(s"_last${s + 1}") =!= "",
              col(s"_last${s + 1}")),
            when(has("wc", s - 1) && col(s"_last${s + 1}") =!= "",
              col(s"_last${s + 1}")))
      }
    val resolved = joined.withColumn(outCol,
      coalesce(candidates :+ col("_last2"): _*))
    val helperCols = (1 to (maxSuffix + 1)).map(n => s"_last$n") ++
      byDepth.keys.flatMap(dp =>
        Seq(s"_rule_$dp", s"_ex_$dp", s"_wc_$dp", s"_xc_$dp"))
    resolved.drop(helperCols: _*)
  }
}
