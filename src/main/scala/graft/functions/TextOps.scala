package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis column functions: tokenization, shingling, language-ID,
  * quality scoring, token counting (training-data-pipeline operators; the
  * reference's analogues are the derived-text columns of
  * `/root/reference/scripts/indexing.py:225-241`).
  *
  * Everything here is a pure Column expression — no UDFs — so the whole
  * pipeline stays inside Catalyst codegen and pushes down to the scan.
  */
object TextOps {

  /** Whitespace tokens, empty strings dropped (texts have trailing spaces). */
  def tokens(c: Column): Column =
    filter(split(c, " "), t => t =!= "")

  /** Overlapping token-window chunks — the retrieval-ingestion front
    * door (each chunk embeds separately; the `window - stride` token
    * overlap preserves context that would otherwise be cut at a chunk
    * boundary). One output row per chunk: (id, chunk_ord, n_tokens,
    * chunk_text), chunk `i` covering tokens [i·stride, i·stride+window).
    *
    * Zero shuffle: tokens are staged once per row and every chunk is a
    * `slice` of that array behind a single posexplode — chunk count is
    * ceil(n/stride) per doc, and the plan stays one codegen'd scan
    * stage at any corpus size. Deterministic: ordinals are positions,
    * not hashes. */
  def chunkWindows(docs: DataFrame, idCol: String, textCol: String,
                   window: Int, stride: Int): DataFrame = {
    require(window >= stride && stride > 0, "need window >= stride > 0")
    val toks = docs
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
    // `__starts` is unconditionally non-empty (greatest(), not a CASE):
    // the optimizer's inferred Generate guard (`size(starts) > 0`)
    // inlines the whole tokenize tree into the scan Filter, and a CASE
    // would double every copy. Empty docs get a sentinel start=0 row
    // instead, dropped by the `__st < __n` predicate below — that one
    // references the GENERATOR output, so it cannot be pushed under the
    // Generate and re-inlined; it reads the carried `__n` column.
    toks
      .withColumn("__starts",
        sequence(lit(0), greatest(col("__n") - 1, lit(0)), lit(stride)))
      .select(col(idCol), col("__toks"), col("__n"),
        posexplode(col("__starts")).as(Seq("chunk_ord", "__st")))
      .where(col("__st") < col("__n"))
      .select(col(idCol),
        col("chunk_ord").cast("long").as("chunk_ord"),
        least(lit(window), col("__n") - col("__st")).cast("long").as("n_tokens"),
        array_join(slice(col("__toks"), col("__st") + 1, lit(window)), " ")
          .as("chunk_text"))
  }

  /** [[chunkWindows]] with the window kept as a TOKEN ARRAY
    * (`chunk_toks`) instead of a joined string — for consumers that
    * immediately re-tokenize (chunk-level BM25, s21): skips building the
    * chunk string and splitting it back. Values identical: tokens are
    * non-empty and whitespace-free, so `tokens(array_join(ts, " ")) == ts`
    * element-for-element (r15). */
  def chunkTokenWindows(docs: DataFrame, idCol: String, textCol: String,
                        window: Int, stride: Int): DataFrame = {
    require(window >= stride && stride > 0, "need window >= stride > 0")
    docs
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .withColumn("__starts",
        sequence(lit(0), greatest(col("__n") - 1, lit(0)), lit(stride)))
      .select(col(idCol), col("__toks"), col("__n"),
        posexplode(col("__starts")).as(Seq("chunk_ord", "__st")))
      .where(col("__st") < col("__n"))
      .select(col(idCol),
        col("chunk_ord").cast("long").as("chunk_ord"),
        slice(col("__toks"), col("__st") + 1, lit(window)).as("chunk_toks"))
  }

  /** Word n-gram shingles (distinct), for Jaccard/MinHash dedup.
    *
    * `toks` is let-bound through a single-element-array `transform` before
    * the gram lambda touches it. Higher-order functions are interpreted
    * (no whole-stage codegen, no common-subexpression elimination), so a
    * free-variable reference like `element_at(toks, i+j)` re-evaluates the
    * ENTIRE `toks` expression per gram per position — when a caller passes
    * `tokens(col)` that is an O(grams x n) re-split of the text, a
    * quadratic blowup per row (measured 15x on the sf0.1 corpus). Binding
    * it to a lambda variable evaluates it exactly once per row regardless
    * of what the caller passes. */
  def shingles(toks: Column, n: Int): Column =
    // One codegen'd pass per row (r15): the interpreted let-bound
    // transform chain evaluated one lambda + one n-way concat tree per
    // gram. Values identical (first-occurrence distinct order, single-
    // space joins; equality pinned by SimHashExprSpec); the coalesce
    // reproduces the old when/otherwise null→empty semantics.
    coalesce(
      org.apache.spark.sql.graft.ColumnBridge.column(
        org.apache.spark.sql.graft.Shingles(
          org.apache.spark.sql.graft.ColumnBridge.expression(toks), n)),
      array().cast("array<string>"))

  /** Fixed per-language marker lexicons for the n-gram-free heuristic
    * language-ID. Deterministic and oracle-expressible: score = number of
    * tokens present in each lexicon, argmax wins, ties break by language
    * code ascending. */
  val langLexicons: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "nicht", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "fr" -> Seq("le", "la", "et", "est", "de"),
    "zh" -> Seq("de", "le", "shi", "he", "zai"))

  /** Heuristic language-ID over a token-array column: per-language marker
    * hit count, argmax with deterministic tie-break. */
  def langId(toks: Column): Column =
    // let-bind toks: each language's filter() is a separate HOF whose
    // child re-evaluates the caller's token expression — 5 tokenizations
    // per row when called as langId(tokens(col)).
    element_at(transform(array(toks), t => langIdStaged(t)), 1)

  private def langIdStaged(toks: Column): Column = {
    val scored = langLexicons.map { case (lang, words) =>
      val hits = size(filter(toks, t => t.isin(words: _*)))
      struct(hits.as("hits"), lit(lang).as("lang"))
    }
    // max over (hits, -lang): array_max on structs orders field-by-field,
    // so to break ties by lang ASC we sort descending on lang within equal
    // hits via aggregate: pick via array_sort + last element trick.
    val arr = array(scored: _*)
    // sort ascending by (hits, lang desc) then take last => max hits, min lang
    val best = element_at(
      array_sort(arr, (l, r) =>
        when(l("hits") < r("hits"), -1)
          .when(l("hits") > r("hits"), 1)
          // equal hits: larger lang first in ascending sort => last has min lang
          .when(l("lang") > r("lang"), -1)
          .when(l("lang") < r("lang"), 1)
          .otherwise(0)),
      -1)
    best("lang")
  }

  /** Stopword ratio / distinct ratio / mean token length quality features,
    * combined into one deterministic [0,1]-ish score (rational arithmetic
    * only — exactly reproducible in any engine). */
  def qualityScore(textCol: Column): Column =
    // let-bind the token array: it feeds four independent features, and
    // without the binding each one re-splits the text.
    element_at(transform(array(tokens(textCol)), t => qualityStaged(t)), 1)

  private def qualityStaged(t: Column): Column = {
    val nTok = size(t).cast("double")
    val stop = Seq("the", "a", "of", "and", "is")
    val stopRatio = size(filter(t, x => x.isin(stop: _*))).cast("double") / nTok
    val distinctRatio = size(array_distinct(t)).cast("double") / nTok
    val meanLen = (length(concat_ws("", t)).cast("double")) / nTok
    // weights sum to 1; clamp mean token length contribution at 8 chars.
    // Empty/whitespace-only text would divide by zero (null in Spark, NaN
    // in an IEEE engine) — define its quality as 0.
    when(nTok === 0.0, lit(0.0)).otherwise(round(
      lit(0.3) * distinctRatio +
      lit(0.3) * (lit(1.0) - stopRatio) +
      lit(0.4) * least(meanLen / 8.0, lit(1.0)), 6))
  }

  /** Whitespace token count. */
  def tokenCountWs(textCol: Column): Column = size(tokens(textCol))

  /** BPE-ish token estimate: count of regex word/number/symbol pieces. */
  def tokenCountRe(textCol: Column): Column =
    size(regexp_extract_all(textCol, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** DEFLATE compression ratio (compressed/raw bytes) — the
    * low-information-content quality signal; see
    * [[org.apache.spark.sql.graft.DeflateRatio]]. */
  def deflateRatio(c: Column): Column = {
    import org.apache.spark.sql.graft.{ColumnBridge, DeflateRatio}
    ColumnBridge.column(DeflateRatio(ColumnBridge.expression(c.cast("string"))))
  }

  /** PII scrub patterns (training-data redaction). Conservative regex
    * subset chosen to behave identically under Java regex (Spark) and RE2
    * (DuckDB oracle): no backrefs, no lookaround, no \b, literal
    * character classes only. */
  val UrlRe = "https?://[^ ]+"
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"

  /** Redact URLs, emails and phone numbers with typed placeholders —
    * URL first so an address inside a query string doesn't leave a
    * partial match behind. Pure `regexp_replace` chain: codegen'd,
    * pushdown-safe, no UDFs. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, UrlRe, "<URL>"),
        EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")

  /** Per-kind PII hit counts (for corpus audits before/after scrubbing). */
  def piiCounts(c: Column): (Column, Column, Column) = (
    size(regexp_extract_all(c, lit(UrlRe), lit(0))).cast("long"),
    size(regexp_extract_all(c, lit(EmailRe), lit(0))).cast("long"),
    size(regexp_extract_all(c, lit(PhoneRe), lit(0))).cast("long"))

  /** Polynomial rolling-hash fingerprint of the full text (base 31, mod
    * 1e9+7) — order-sensitive, unlike a bag-of-words hash. Modulus keeps
    * `acc * 31 + 255` far below 2^63, so the arithmetic is exact int64 in
    * any engine. */
  /** Text canonicalization for dedup keys and tokenizer input: lowercase,
    * strip everything outside [a-z0-9 ], collapse whitespace runs, trim.
    * The standard pre-pass before exact/fuzzy dedup — two near-identical
    * crawls of a page differ in casing/punctuation long before they
    * differ in words. Pure codegen'd string expressions (ASCII-level; a
    * real crawl pipeline would add unicode NFC at the decode stage). */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  def fingerprint(textCol: Column): Column = {
    val p = 1000000007L
    aggregate(
      split(textCol, ""),
      lit(0L),
      (acc, ch) => pmod(acc * 31L + ascii(ch).cast("long"), lit(p)))
  }
}
