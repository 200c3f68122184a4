package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.functions.{HashOps, TextOps}

class TextHashOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens drop empty strings from trailing/double spaces") {
    val df = Seq("a b  c ").toDF("t")
    val toks = df.select(TextOps.tokens(col("t"))).head().getSeq[String](0)
    assert(toks == Seq("a", "b", "c"))
  }

  test("shingles: n-grams, distinct, empty below n tokens") {
    val df = Seq("a b c d", "a b").toDF("t")
    val sh = df.select(TextOps.shingles(TextOps.tokens(col("t")), 3).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(sh(0) == Seq("a b c", "b c d"))
    assert(sh(1).isEmpty)
  }

  test("fingerprint matches a manual rolling-hash computation") {
    val text = "hello world"
    val want = text.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    val got = Seq(text).toDF("t")
      .select(TextOps.fingerprint(col("t"))).head().getLong(0)
    assert(got == want)
  }

  test("stable id matches manual md5-prefix arithmetic and fits in 60 bits") {
    val s = "some document text"
    val hex = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    val want = java.lang.Long.parseLong(hex, 16)
    val got = Seq(s).toDF("t").select(HashOps.stableId(col("t"))).head().getLong(0)
    assert(got == want)
    assert(got >= 0 && got < (1L << 60))
  }

  test("content hash skips nulls via concat_ws (canonical form stability)") {
    val df = Seq(("a", Option("b")), ("a|b", None: Option[String]))
      .toDF("x", "y")
    val hashes = df.select(HashOps.contentHash(col("x"), col("y")))
      .collect().map(_.getString(0))
    // 'a'|'b' and 'a|b'|NULL both canonicalize to "a|b" — documented
    // delimiter-injection property of the reference's canonical concat
    assert(hashes(0) == hashes(1))
  }

  test("langId: marker-lexicon argmax with deterministic tie-break") {
    val df = Seq(
      "the cat and the hat is big", // en markers
      "der hund und die katze ist", // de markers
      "xyzzy qwerty"                // no markers -> tie -> 'de' (min code)
    ).toDF("t")
    val out = df.select(TextOps.langId(TextOps.tokens(col("t")))).collect()
      .map(_.getString(0))
    assert(out(0) == "en")
    assert(out(1) == "de")
    assert(out(2) == "de")
  }

  test("quality score stays in [0,1] and rewards diverse non-stopword text") {
    val df = Seq(
      "alpha bravo charlie delta echo foxtrot golf hotel",
      "the the the the the the the the").toDF("t")
    val q = df.select(TextOps.qualityScore(col("t"))).collect().map(_.getDouble(0))
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(0) > q(1))
  }

  test("token counts: whitespace vs regex pieces") {
    val df = Seq("hello, world! x3").toDF("t")
    val r = df.select(
      TextOps.tokenCountWs(col("t")).as("ws"),
      TextOps.tokenCountRe(col("t")).as("re")).head()
    assert(r.getInt(0) == 3)
    // pieces: hello , world ! x 3
    assert(r.getInt(1) == 6)
  }

  test("hash sampling: stable across calls, split is disjoint+exhaustive, rate lands near target") {
    import graft.functions.Sampling
    val docs = graft.tables.Tables.documents(spark, Sf0001)
    val s1 = Sampling.hashSample(docs, "doc_id", 3000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Sampling.hashSample(docs, "doc_id", 3000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1 == s2 && s1.nonEmpty) // deterministic: same rows every run
    val n = docs.count().toDouble
    assert(math.abs(s1.size / n - 0.30) < 0.15, s"rate ${s1.size / n}")

    val (train, heldOut) = Sampling.split(docs, "doc_id", 1000)
    val t = train.select("doc_id").collect().map(_.getLong(0)).toSet
    val h = heldOut.select("doc_id").collect().map(_.getLong(0)).toSet
    assert((t & h).isEmpty && (t ++ h).size == n.toLong) // leakage-free, total
  }

  test("capPerGroup: salted two-phase election equals the naive window under 90% skew") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Sampling
    import spark.implicits._
    // one hot group with 900 rows (and score ties), many cold singletons
    val rows = (0 until 900).map(i => (i.toLong, "hot", (i % 7).toLong)) ++
      (900 until 1000).map(i => (i.toLong, s"cold$i", i.toLong))
    val df = rows.toDF("id", "grp", "score")
    val got = Sampling.capPerGroup(df, "grp", "score", "id", cap = 5, salts = 4)
      .select("id", "grp").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val naive = df.withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        Window.partitionBy($"grp").orderBy($"score".desc, $"id".asc)))
      .where($"rn" <= 5).select("id", "grp")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == naive)
    assert(got.count(_._2 == "hot") == 5 && got.size == 105)
  }

  test("ppsSystematic: n picks per stratum, heavy rows guaranteed, multiple-cover collapses") {
    import graft.functions.Sampling
    val corpus = graft.tables.Tables.documents(spark, Sf0001)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val picks = Sampling.ppsSystematic(corpus, "source", "n_chars", "doc_id", n = 5)
    val perSource = picks.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every stratum yields picks; at most n rows each (exactly n unless a
    // single row spans several step multiples)
    assert(perSource.nonEmpty && perSource.values.forall(c => c >= 1 && c <= 5))
    // deterministic: re-running selects the identical set
    val a = picks.collect().map(_.getLong(0)).toSet
    val b = Sampling.ppsSystematic(corpus, "source", "n_chars", "doc_id", n = 5)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)

    // handcrafted: one row heavier than the step covers BOTH multiples and
    // is emitted once; light rows before it are skipped
    val tiny = Seq((1L, "s", 1L), (2L, "s", 1L), (3L, "s", 1L), (4L, "s", 97L))
      .toDF("doc_id", "source", "n_chars")
    val sel = Sampling.ppsSystematic(tiny, "source", "n_chars", "doc_id", n = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(sel == Seq(4L))
    // a row wider than total/n can never be missed (pigeonhole)
    val withHeavy = Sampling.ppsSystematic(tiny, "source", "n_chars", "doc_id", n = 2)
      .collect().map(_.getLong(0)).toSet
    assert(withHeavy.contains(4L))
  }

  test("budgetPrefix equals the naive global running-sum window and never overshoots") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.{HashOps, Sampling}
    import spark.implicits._
    val df = (0L until 400L).map(i => (i, 1L + i % 37)).toDF("id", "w")
    val budget = 2000L
    val got = Sampling.budgetPrefix(df, "id", "w", budget, buckets = 16)
      .collect().map(_.getLong(0)).toSet
    val h = HashOps.tokenHash32(col("id").cast("string"))
    val naive = df
      .withColumn("cum", sum($"w").over(
        Window.orderBy(pmod(h, lit(16L)), h, $"id")))
      .where($"cum" <= budget).collect().map(_.getLong(0)).toSet
    assert(got == naive && got.nonEmpty && got.size < 400)
    // spent total is within budget and maximal (adding the next doc in
    // hash order would cross it)
    val spent = df.where($"id".isin(got.toSeq: _*)).agg(sum($"w")).head().getLong(0)
    assert(spent <= budget)
    // degenerate ends: everything fits / nothing fits
    assert(Sampling.budgetPrefix(df, "id", "w", 1000000L, 16).count() == 400L)
    assert(Sampling.budgetPrefix(df, "id", "w", 0L, 16).count() == 0L)
  }

  test("mixToTarget realizes the exact ratio at max volume; starved domain empties the mix") {
    import graft.functions.Sampling
    import spark.implicits._
    // en:100, de:30, fr:9 -> T = min(50, 30, 9) = 9 with weights 2/1/1
    val rows = (0 until 100).map(i => (i.toLong, "en")) ++
      (100 until 130).map(i => (i.toLong, "de")) ++
      (130 until 139).map(i => (i.toLong, "fr")) ++
      (139 until 150).map(i => (i.toLong, "zz")) // unspec'd: dropped
    val df = rows.toDF("id", "lang")
    val mix = Sampling.mixToTarget(df, "id", "lang",
      Map("en" -> 2, "de" -> 1, "fr" -> 1))
    val per = mix.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(per == Map("en" -> 18L, "de" -> 9L, "fr" -> 9L))
    // deterministic election
    val a = mix.collect().map(_.getLong(0)).toSet
    val b = Sampling.mixToTarget(df, "id", "lang",
      Map("en" -> 2, "de" -> 1, "fr" -> 1)).collect().map(_.getLong(0)).toSet
    assert(a == b)
    // a spec'd domain with too few rows to fill one batch -> empty mix,
    // never a silently wrong ratio
    assert(Sampling.mixToTarget(df, "id", "lang",
      Map("en" -> 1, "xx" -> 1)).count() == 0L)
  }

  test("pii redaction: typed placeholders, url-before-email order, clean text untouched") {
    val df = Seq(
      "mail me at jane.doe+x@corp.example.org today",
      "call 555-123-4567 or +1 555.987.6543 now",
      "docs at https://ex.com/a?user=bob@ex.com here",
      "nothing sensitive in this one").toDF("t")
    val out = df.select(TextOps.redactPii(col("t"))).collect().map(_.getString(0))
    assert(out(0) == "mail me at <EMAIL> today")
    assert(out(1).contains("<PHONE>") && !out(1).matches(".*[0-9]{3}-[0-9]{3}.*"))
    // URL swallowed first -> the embedded email never half-matches
    assert(out(2) == "docs at <URL> here")
    assert(out(3) == "nothing sensitive in this one")
  }

  test("display ops: truncation boundary, url prefixing cases, score labels") {
    import graft.functions.DisplayOps
    val t = Seq("12345678901234567890", "123456789012345678901").toDF("t")
      .select(DisplayOps.truncateEllipsis(col("t"), 20))
      .collect().map(_.getString(0))
    assert(t(0) == "12345678901234567890")        // exactly maxLen: untouched
    assert(t(1) == "12345678901234567..." && t(1).length == 20)

    val urls = Seq("http://a/b.png", "/img/c.png", "img/d.png", "", null)
      .toDF("u").select(DisplayOps.prefixUrl(col("u"), "http://base"))
      .collect().map(_.getString(0))
    assert(urls(0) == "http://a/b.png")
    assert(urls(1) == "http://base/img/c.png")
    assert(urls(2) == "http://base/img/d.png")
    assert(urls(3) == "")
    assert(urls(4) == null)

    val labels = Seq(0.85, 0.8, 0.75, 0.65, 0.55, 0.45, 0.35, 0.1).toDF("s")
      .select(DisplayOps.scoreLabel(col("s"))).collect().map(_.getString(0))
    assert(labels.toSeq == Seq("Excellent", "Excellent", "Very Good", "Good",
      "Fair", "Poor", "Very Poor", "No Match"))
  }

  test("deflate ratio: repetition compresses to near-zero, digests don't, nulls/empties defined") {
    import graft.functions.TextOps
    val rows = Seq(
      "a" * 1000,                                   // pure repetition
      ("the quick brown fox jumps over the lazy dog. " * 20),
      (0 until 320).map(i => s"x$i".hashCode.toHexString).mkString, // no repeats
      "",                                            // empty -> defined 1.0
      null                                           // null in, null out
    ).toDF("t").select(TextOps.deflateRatio(col("t")).as("r"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(rows(0).get < 0.05, s"repetition ${rows(0)}")
    assert(rows(1).get < 0.2, s"repeated sentence ${rows(1)}")
    assert(rows(0).get < rows(1).get && rows(1).get < rows(2).get)
    assert(rows(3).contains(1.0))
    assert(rows(4).isEmpty)
    // deterministic across evaluation paths (codegen vs interpreted is
    // the same helper; re-run equality guards against codec statefulness)
    val again = Seq("a" * 1000).toDF("t")
      .select(TextOps.deflateRatio(col("t"))).collect()(0).getDouble(0)
    assert(rows(0).contains(again))
  }

  test("url canonicalization: case/port/www/tracking/fragment variants collapse") {
    import graft.functions.UrlOps
    def canon(u: String): String = Seq(u).toDF("u")
      .select(UrlOps.canonicalize(col("u"))).head().getString(0)
    // the full mess collapses
    assert(canon("HTTPS://WWW.A.Example.COM:443/docs/5?utm_source=x&page=3#top")
      == "https://a.example.com/docs/5?page=3")
    // already-canonical is a fixpoint
    assert(canon("https://a.example.com/docs/5?page=3")
      == "https://a.example.com/docs/5?page=3")
    // tracking-only query drops entirely; trailing slash strips
    assert(canon("http://b.org:80/x/?utm_campaign=m") == "http://b.org/x")
    // path case preserved (paths are case-sensitive), host case is not
    assert(canon("https://C.net/Path/File") == "https://c.net/Path/File")
    // mid-list tracking param removal repairs separators
    assert(canon("https://d.io/p?a=1&fbclid=zz&b=2") == "https://d.io/p?a=1&b=2")
    // host + registered domain extraction
    val hd = Seq("https://deep.sub.e.example.org/x").toDF("u")
      .select(UrlOps.canonicalize(col("u")).as("c"))
      .select(UrlOps.host(col("c")).as("h"))
      .select(col("h"), UrlOps.registeredDomain(col("h")).as("rd")).head()
    assert(hd.getString(0) == "deep.sub.e.example.org")
    assert(hd.getString(1) == "example.org")
  }

  test("url canonicalization: tracking-param strip anchors to the name start") {
    import graft.functions.UrlOps
    def canon(u: String): String = Seq(u).toDF("u")
      .select(UrlOps.canonicalize(col("u"))).head().getString(0)
    // `aref` must NOT lose its `ref` tail (the unanchored regex spliced
    // `?aref=1&b=2` into `?ab=2`, merging distinct URLs under one key)
    assert(canon("https://a.com/p?aref=1&b=2") == "https://a.com/p?aref=1&b=2")
    assert(canon("https://a.com/p?href=x&xref=y") == "https://a.com/p?href=x&xref=y")
    // underscore is a word char: `page_ref` protected too
    assert(canon("https://a.com/p?page_ref=7") == "https://a.com/p?page_ref=7")
    // the real param still strips, at ? and at &
    assert(canon("https://a.com/p?ref=rss") == "https://a.com/p")
    assert(canon("https://a.com/p?a=1&ref=rss&b=2") == "https://a.com/p?a=1&b=2")
  }

  test("url canonicalization: default-port strip is scheme-aware") {
    import graft.functions.UrlOps
    def canon(u: String): String = Seq(u).toDF("u")
      .select(UrlOps.canonicalize(col("u"))).head().getString(0)
    // scheme-matching defaults strip
    assert(canon("https://a.com:443/x") == "https://a.com/x")
    assert(canon("http://a.com:80/x") == "http://a.com/x")
    // explicit NON-default ports are distinct origins and must survive
    assert(canon("http://a.com:443/x") == "http://a.com:443/x")
    assert(canon("https://a.com:80/x") == "https://a.com:80/x")
    assert(canon("https://a.com:8443/x") == "https://a.com:8443/x")
  }

  test("registered domain: public-suffix table handles co.uk-class hosts") {
    import graft.functions.UrlOps
    val hosts = Seq(
      "docs.bbc.co.uk",      // 2-label suffix: rd = bbc.co.uk
      "www.example.com",     // 1-label suffix: rd = example.com
      "a.b.shop.com.au",     // 2-label suffix, deep host: rd = shop.com.au
      "site.internal",       // unknown TLD: 2-label fallback
      "localhost"            // single label: fallback yields ''-safe last2
    ).toDF("host")
    val rd = UrlOps.withRegisteredDomain(hosts, "host", "rd")
      .orderBy(col("host")).collect().map(r => (r.getString(0), r.getString(1)))
    assert(rd.toMap == Map(
      "docs.bbc.co.uk" -> "bbc.co.uk",
      "www.example.com" -> "example.com",
      "a.b.shop.com.au" -> "shop.com.au",
      "site.internal" -> "site.internal",
      "localhost" -> ""))
  }

  test("registered domain, full PSL: exact depths, wildcards, exceptions, IDN twins") {
    import graft.functions.UrlOps
    val hosts = Seq(
      "a.b.example.co.uk",   // exact 2-label rule co.uk
      "www.example.com",     // exact 1-label rule com
      "docs.foo.act.edu.au", // exact 3-label rule — the fixture table misses these
      "x.y.ck",              // wildcard *.ck: suffix y.ck, rd = one more label
      "w.x.y.ck",            // deeper host under the same wildcard
      "foo.www.ck",          // exception !www.ck prevails over *.ck
      "www.ck",              // the exception body itself
      "a.b.kawasaki.jp",     // wildcard with a 2-label base (*.kawasaki.jp beats jp)
      "x.city.kawasaki.jp",  // exception with a 3-label body (!city.kawasaki.jp)
      "site.xn--p1ai",       // punycode twin of the unicode rule рф
      "сайт.рф",             // the unicode rule directly
      "site.internal",       // unlisted TLD: implicit-* 2-label heuristic
      "co.uk"                // host IS a public suffix: documented total fallthrough
    ).toDF("host")
    val rd = UrlOps.withRegisteredDomainPsl(hosts, "host", "rd")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(rd == Map(
      "a.b.example.co.uk" -> "example.co.uk",
      "www.example.com" -> "example.com",
      "docs.foo.act.edu.au" -> "foo.act.edu.au",
      "x.y.ck" -> "x.y.ck",
      "w.x.y.ck" -> "x.y.ck",
      "foo.www.ck" -> "www.ck",
      "www.ck" -> "www.ck",
      "a.b.kawasaki.jp" -> "a.b.kawasaki.jp",
      "x.city.kawasaki.jp" -> "city.kawasaki.jp",
      "site.xn--p1ai" -> "site.xn--p1ai",
      "сайт.рф" -> "сайт.рф",
      "site.internal" -> "site.internal",
      "co.uk" -> "co.uk"), rd)
  }

  test("SeqPack.globalOffsets: two-pass prefix sum == the one-window cumsum, on a genuinely multi-partition run") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.SeqPack
    // 200 docs, irregular token counts incl. zeros; 8 range partitions
    val docs = (0L until 200L).map(i => (i, (i * 7 + 3) % 23)).toDF("id", "n")
    val got = SeqPack.globalOffsets(docs, "id", "n", parts = 8)
    // the plan must actually fan out: the cumsum window is PER-BUCKET
    // (hash exchange on the value-derived bucket id), never a
    // no-partition global sort funnel
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(__pid"), plan.take(800))
    // the naive one-task spelling is the semantic definition
    val want = docs.withColumn("start_off",
      sum(col("n")).over(Window.orderBy(col("id"))) - col("n"))
    val g = got.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2)))
    val w = want.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(g.sameElements(w))
  }

  test("SeqPack.globalOffsets: boundary-placement independence — skewed keys, repeated evaluation, and parts=1 all agree") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.SeqPack
    // skewed, non-contiguous keys: quantile boundaries land unevenly and
    // several buckets stay near-empty — offsets must not care
    val docs = ((0L until 500L).map(i => i * i * 7L % 100000L).distinct)
      .map(id => (id, id % 17)).toDF("id", "n")
    def offs(parts: Int) = SeqPack.globalOffsets(docs, "id", "n", parts)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    val want = docs.withColumn("start_off",
        sum(col("n")).over(Window.orderBy(col("id"))) - col("n"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(offs(8) == want)
    assert(offs(1) == want)   // degenerate single bucket: still exact
    assert(offs(8) == offs(8)) // re-evaluation: a pure value function
                               // cannot disagree with itself (the
                               // repartitionByRange+spark_partition_id
                               // spelling DID, via resampled boundaries)
  }

  test("SeqPack.binManifest: full bins tile [0, budget) exactly; zero-token docs emit nothing") {
    import graft.functions.SeqPack
    // 4 docs, 25 tokens total, budget 10: bins 0,1 full, bin 2 partial
    val docs = Seq((1L, 8L), (2L, 0L), (3L, 15L), (4L, 2L)).toDF("id", "n")
    val m = SeqPack.binManifest(docs, "id", "n", budget = 10L, parts = 4)
      .orderBy("bin", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(m.toSeq == Seq(
      (0L, 1L, 0L, 8L), (0L, 3L, 8L, 2L),   // bin 0: doc1[0,8) doc3[8,10)
      (1L, 3L, 0L, 10L),                     // bin 1: doc3 alone
      (2L, 3L, 0L, 3L), (2L, 4L, 3L, 2L)))   // bin 2 partial: 3+2=5 of 10
    // audit: every full bin's lens sum to the budget and tile exactly
    for (bin <- Seq(0L, 1L)) {
      val segs = m.filter(_._1 == bin).map(s => (s._3, s._4)).sortBy(_._1)
      assert(segs.map(_._2).sum == 10L, s"bin $bin not full")
      assert(segs.scanLeft(0L)(_ + _._2).init.sameElements(segs.map(_._1)),
        s"bin $bin segments don't tile: ${segs.toSeq}")
    }
    assert(!m.exists(_._2 == 2L)) // the zero-token doc appears nowhere
  }

  test("SeqPack.pack: boundary spans, zero-token docs, and more-partitions-than-rows") {
    import graft.functions.SeqPack
    // budget 10: doc 1 (n=8) [0,8) bin 0; doc 2 (n=0) degenerate at off 8
    // bin 0; doc 3 (n=15) [8,23) SPANS bins 0..2; doc 4 (n=2) [23,25) bin 2
    val docs = Seq((1L, 8L), (2L, 0L), (3L, 15L), (4L, 2L)).toDF("id", "n")
    val out = SeqPack.pack(docs, "id", "n", budget = 10L, parts = 16)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      (1L, 0L, 0L, 0L, 1L),
      (2L, 8L, 0L, 0L, 1L),   // 0 tokens: its start bin, spanning nothing
      (3L, 8L, 0L, 2L, 3L),   // crosses two boundaries
      (4L, 23L, 2L, 2L, 1L)))
  }
}
