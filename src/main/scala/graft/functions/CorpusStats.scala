package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level text statistics for training-data curation: repetition
  * quality filters (the Gopher-rule family) and unigram-LM surprisal
  * scoring (the cheap, fully-distributed stand-in for model-based
  * perplexity bucketing). Both are pure relational pipelines — exploded
  * tokens, partial-aggregated shuffles, broadcast joins for the tiny
  * vocabulary side — so they scale as ordinary groupBys: no UDFs, no
  * driver loops, no per-document lambdas (the lambda-CSE trap).
  */
object CorpusStats {

  /** (doc_id, pos, tok) exploded whitespace tokens; empties filtered.
    * The token array materializes once per row inside the Generate —
    * the explode is the CSE barrier. */
  private def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      posexplode(expr("filter(split(text, ' '), t -> t != '')")))
      .toDF("doc_id", "pos", "tok")

  /** Gopher-style repetition metrics per document:
    *  - `top_token_frac`: share of the most frequent unigram;
    *  - `dup_token_frac`: share of tokens whose unigram occurs >1 time;
    *  - `top_bigram_frac`: share of the most frequent bigram;
    *  - `keep`: the composed filter verdict.
    * Thresholds are calibrated to the corpus (p50 splits) the way Gopher's
    * were to MassiveText. All fractions are integer-count divisions
    * rounded to 6dp, and `keep` compares the ROUNDED values — so the
    * verdict is engine-independent at the boundary.
    *
    * Shape: two shuffles on (doc_id, gram) + one on doc_id; the bigram
    * window is partitioned by doc_id. Survives 100×: everything is
    * partial-aggregated, keys are document-local.
    */
  def repetitionMetrics(docs: DataFrame,
                        maxTopTokenFrac: Double = 0.11,
                        maxTopBigramFrac: Double = 0.05,
                        maxDupTokenFrac: Double = 0.9): DataFrame = {
    val toks = tokens(docs)
    val uni = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    val ua = uni.groupBy("doc_id").agg(
      sum("c").as("n"),
      max("c").as("maxc"),
      count(lit(1)).as("nd"),
      sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dupc"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val ba = toks
      .withColumn("nxt", lead("tok", 1).over(w))
      .where(col("nxt").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("tok"), col("nxt")).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("maxb"), sum("c").as("nb"))
    ua.join(ba, Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("n").as("n_tokens"),
        col("nd").as("distinct_tokens"),
        round(col("maxc") / col("n"), 6).as("top_token_frac"),
        round(col("dupc") / col("n"), 6).as("dup_token_frac"),
        round(coalesce(col("maxb") / col("nb"), lit(0.0)), 6).as("top_bigram_frac"))
      .withColumn("keep",
        col("top_token_frac") <= maxTopTokenFrac &&
          col("top_bigram_frac") <= maxTopBigramFrac &&
          col("dup_token_frac") <= maxDupTokenFrac)
  }

  /** The composed curation pipeline — what a real pretraining filter runs
    * per document: language-ID, heuristic quality, repetition, LM
    * surprisal, folded into one keep/drop verdict with the FIRST failing
    * rule as the reason (rule order = cheap to expensive, the order a
    * production pipeline would short-circuit in). Every input metric is
    * an already-rounded value from its own oracle-proven operator, so the
    * verdict is engine-independent at every threshold boundary.
    *
    * One pass composes four operators but the corpus is scanned once per
    * metric family and joined on doc_id — at 100 TB each join is
    * co-partitioned by the same key the aggregations already produced.
    */
  def curationVerdict(docs: DataFrame,
                      minQuality: Double = 0.62,
                      maxTopTokenFrac: Double = 0.13,
                      maxSurprisal: Double = 3.41): DataFrame =
    curationVerdictWithLm(docs, unigramLogProbs(docs),
      minQuality, maxTopTokenFrac, maxSurprisal)

  /** [[curationVerdict]] against a SUPPLIED language model — the serving
    * form: train the LM once on the reference corpus, freeze it, score
    * any later batch (or every streaming micro-batch; see
    * `DeltaStream.curationIngest`) against the same probabilities.
    * Documents whose tokens are all out-of-vocabulary score no surprisal
    * and drop out (inner join) — the same semantics as the self-trained
    * composition, where OOV cannot occur. */
  def curationVerdictWithLm(docs: DataFrame, lp: DataFrame,
                            minQuality: Double = 0.62,
                            maxTopTokenFrac: Double = 0.13,
                            maxSurprisal: Double = 3.41): DataFrame = {
    val base = docs.select(col("doc_id"),
      TextOps.langId(TextOps.tokens(col("text"))).as("pred_lang"),
      TextOps.qualityScore(col("text")).as("quality"))
    val rep = repetitionMetrics(docs).select("doc_id", "top_token_frac")
    val lm = surprisalWithLm(docs, lp).select("doc_id", "surprisal")
    base.join(rep, Seq("doc_id")).join(lm, Seq("doc_id"))
      .withColumn("reason",
        when(col("quality") < minQuality, lit("low_quality"))
          .when(col("top_token_frac") > maxTopTokenFrac, lit("repetitive"))
          .when(col("surprisal") > maxSurprisal, lit("surprising"))
          .otherwise(lit("ok")))
      .withColumn("keep", col("reason") === "ok")
  }

  /** Unigram-LM surprisal per document: the corpus defines p(tok) =
    * count/total, each document scores mean −ln p over its token
    * occurrences. The distributed analogue of CCNet's LM perplexity
    * bucketing, with the corpus itself as the LM. Per-token log-probs are
    * rounded to 9dp and summed via ordered fold (sort, then left fold) so
    * the float total is identical regardless of engine or partitioning —
    * see the determinism rules in Queries.scala.
    *
    * Shape: one vocabulary agg (tiny — broadcast back), one doc-id agg.
    * The vocabulary side is a broadcast join, never a shuffle of the
    * corpus.
    */
  def unigramSurprisal(docs: DataFrame): DataFrame =
    surprisalWithLm(docs, unigramLogProbs(docs))

  /** The trained unigram LM: (tok, lp) with lp = ln(count/total) rounded
    * to 9dp. This is the frozen artifact a serving/streaming path scores
    * against — persist it like any other index.
    *
    * The vocab aggregate feeds BOTH the corpus total and the per-token
    * log-probs; without the localCheckpoint Catalyst re-expands the
    * subtree and the full corpus tokenize+aggregate runs twice — at
    * 100 TB that is an entire extra pass over the data to compute one
    * scalar. The checkpoint materializes only vocab-sized rows (same
    * trade, and same disclosure, as ngramJaccard's inverted-index
    * checkpoint: executor-local blocks, lineage cut — prefer reliable
    * checkpoint on a real cluster if executor loss matters). */
  def unigramLogProbs(docs: DataFrame): DataFrame = {
    val vocab = tokens(docs).groupBy("tok").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val total = vocab.agg(sum("cnt").as("tot"))
    vocab.crossJoin(broadcast(total))
      .select(col("tok"), round(log(col("cnt") / col("tot")), 9).as("lp"))
  }

  /** Per-doc mean −ln p against a supplied (tok, lp) model; ordered-fold
    * summation keeps the float total partition-invariant. Unknown tokens
    * are skipped (inner join) — identical to the self-trained form, where
    * they cannot occur. */
  def surprisalWithLm(docs: DataFrame, lp: DataFrame): DataFrame =
    tokens(docs).select("doc_id", "tok")
      .join(broadcast(lp), Seq("tok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        expr("aggregate(array_sort(collect_list(lp)), cast(0 as double), (a, x) -> a + x)")
          .as("slp"))
      .select(col("doc_id"), col("n_tokens"),
        round(-col("slp") / col("n_tokens"), 6).as("surprisal"))

  /** (doc_id, w1, w2) consecutive-token bigrams, generated per row with
    * zero shuffle: the token array is let-bound once (the HOF-CSE rule —
    * see TextOps.shingles), the gram structs are built by index, and the
    * explode is the only Generate. Documents with fewer than two tokens
    * produce no rows. */
  private def bigrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(element_at(transform(
        array(expr("filter(split(text, ' '), t -> t != '')")), t =>
          when(size(t) >= 2,
            transform(sequence(lit(0), size(t) - 2), i =>
              struct(element_at(t, i + 1).as("w1"),
                element_at(t, i + 2).as("w2"))))
            .otherwise(array().cast("array<struct<w1:string,w2:string>>"))),
        1)).as("bg"))
      .select(col("doc_id"), col("bg.w1"), col("bg.w2"))

  /** Interpolated bigram-LM cross-entropy per document — the next model
    * class up from [[unigramSurprisal]] (CCNet buckets on a 5-gram KenLM;
    * a Jelinek-Mercer-interpolated bigram is the same idea at corpus
    * scale with exact, engine-independent arithmetic):
    *
    *   P(w2|w1) = λ·c(w1,w2)/c(w1·) + (1−λ)·c(w2)/T
    *
    * with c(w1·) the bigram-left count (so the conditional sums to 1) and
    * T the unigram total. Per-doc score = mean −ln P over its bigrams;
    * docs with <2 tokens have no bigrams and are absent (same contract as
    * the oracle's GROUP BY). Determinism: log-probs rounded to 9dp, per-doc
    * ordered-fold summation, final round to 6dp.
    *
    * Shape at scale: bigrams are generated per row (no shuffle), counted
    * with ONE map-side-combined shuffle (checkpointed so the c(w1·)
    * roll-up doesn't re-expand the corpus agg), and scored with a plain
    * equi-join on (w1,w2) — deliberately NOT broadcast-hinted: a web-scale
    * bigram vocabulary is far over any broadcast threshold, so the join
    * must stay a shuffled hash join (AQE may still broadcast a small
    * model). The doc-id fold is the second and final corpus shuffle. */
  def bigramSurprisal(docs: DataFrame, lambda: Double = 0.7): DataFrame = {
    val bg = bigrams(docs)
    val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .localCheckpoint()
    val c1 = c12.groupBy("w1").agg(sum("c12").as("c1"))
    val uni = tokens(docs).groupBy("tok").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val tot = uni.agg(sum("cnt").as("tot"))
    val lp = c12.join(c1, Seq("w1"))
      .join(uni.withColumnRenamed("tok", "w2"), Seq("w2"))
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"),
        round(log(lit(lambda) * (col("c12") / col("c1")) +
          lit(1.0 - lambda) * (col("cnt") / col("tot"))), 9).as("lp"))
    bg.join(lp, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        expr("aggregate(array_sort(collect_list(lp)), cast(0 as double), (a, x) -> a + x)")
          .as("slp"))
      .select(col("doc_id"), col("n_bigrams"),
        round(-col("slp") / col("n_bigrams"), 6).as("xent"))
  }

  /** Multinomial Naive Bayes language classifier, trained on the even
    * doc_ids and applied to the odd ones — the distributed stand-in for
    * the fastText-style quality/language classifier step real curation
    * pipelines run (CCNet's lang-ID, LLaMA's quality classifier): a
    * supervised train/score workflow expressed as pure relational algebra.
    *
    * Model: P(c) = docs_c/docs, P(tok|c) Laplace-smoothed
    * (cnt+1)/(tot_c+V); prediction = argmax_c ln P(c) + Σ ln P(tok|c),
    * unseen tokens scoring the class default ln 1/(tot_c+V). Ties break
    * to the lexicographically smallest class via the rank window.
    * Determinism: every log is rounded to 9dp, per-(doc,class) sums are
    * ordered folds, so the argmax compares bit-identical doubles on any
    * engine.
    *
    * Shape at scale: ONE (class,tok) count shuffle over the train split
    * (map-side combined, checkpointed so V and totals don't re-expand
    * it); the test stream fans out ×|classes| (a handful) against a
    * BROADCAST class table, left-joins the model on (class,tok) — NOT
    * broadcast-hinted, a web-scale vocab×classes model exceeds any
    * threshold — and folds per (doc,class). Test docs with zero tokens
    * carry no evidence and are absent (same contract as the oracle). */
  def nbLangClassifier(docs: DataFrame): DataFrame = {
    val toks = tokens(docs)
    val train = toks.where(col("doc_id") % 2 === 0)
    val classes = docs.where(col("doc_id") % 2 === 0)
      .groupBy(col("lang").as("cls")).agg(count(lit(1)).as("n_docs"))
      .localCheckpoint()
    val ntr = classes.agg(sum("n_docs").as("n"))
    val prior = classes.crossJoin(broadcast(ntr))
      .select(col("cls"), round(log(col("n_docs") / col("n")), 9).as("plp"))
    val ctc = train.join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy(col("lang").as("cls"), col("tok"))
      .agg(count(lit(1)).as("cnt")).localCheckpoint()
    val tot = ctc.groupBy("cls").agg(sum("cnt").as("tot"))
    val v = ctc.agg(countDistinct(col("tok")).as("v"))
    val lp = ctc.join(tot, Seq("cls")).crossJoin(broadcast(v))
      .select(col("cls"), col("tok"),
        round(log((col("cnt") + 1) / (col("tot") + col("v"))), 9).as("lp"))
    val dflt = tot.crossJoin(broadcast(v))
      .select(col("cls"), round(log(lit(1.0) / (col("tot") + col("v"))), 9).as("dlp"))
    val pertok = toks.where(col("doc_id") % 2 === 1).select("doc_id", "tok")
      .crossJoin(broadcast(classes.select("cls")))
      .join(broadcast(dflt), Seq("cls"))
      .join(lp, Seq("cls", "tok"), "left")
      .select(col("doc_id"), col("cls"), coalesce(col("lp"), col("dlp")).as("w"))
    val sc = pertok.join(broadcast(prior), Seq("cls"))
      .groupBy("doc_id", "cls", "plp")
      .agg(expr("aggregate(array_sort(collect_list(w)), cast(0 as double), (a, x) -> a + x)")
        .as("slp"))
      .select(col("doc_id"), col("cls"), (col("plp") + col("slp")).as("score"))
    val rankW = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("cls").asc)
    sc.withColumn("rn", row_number().over(rankW)).where(col("rn") === 1)
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .select(col("doc_id"), col("cls").as("pred_lang"), col("lang"),
        (col("cls") === col("lang")).as("correct"))
  }

  /** Exact tie-aware ROC AUC of a score column against a boolean label —
    * the evaluation half of the classifier workflow (is the quality score
    * actually predictive?). Mann-Whitney form: for each distinct score,
    * positives count every negative strictly below plus half the
    * negatives tied with them; AUC = Σ contributions / (P·N).
    *
    * Exactness: counts are integers and the only fraction is ·0.5, so
    * every contribution is a half-integer — double arithmetic is EXACT
    * below 2^52 and the sum is order-independent (no fold discipline
    * needed). Shape at scale: one groupBy on score (corpus-sized shuffle,
    * map-side combined), then a single-partition running sum over the
    * DISTINCT scores — bounded by score resolution (a 6dp-rounded score
    * has ≤ ~10⁶ distinct values no matter the corpus), not by rows. */
  def rocAuc(scored: DataFrame, scoreCol: String, posCol: String): DataFrame = {
    val g = scored.groupBy(col(scoreCol).as("score")).agg(
      sum(when(col(posCol), 1L).otherwise(0L)).as("np"),
      sum(when(!col(posCol), 1L).otherwise(0L)).as("nn"))
    val w = Window.orderBy("score")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = g.withColumn("below", sum("nn").over(w) - col("nn"))
    val t = g.agg(sum("np").as("p"), sum("nn").as("n"))
    c.agg(sum(col("np") * (col("below") + lit(0.5) * col("nn"))).as("num"))
      .crossJoin(broadcast(t))
      .select(round(col("num") / (col("p") * col("n")), 6).as("auc"),
        col("p").as("n_pos"), col("n").as("n_neg"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"), unigram variant:
    * every token gets a Laplace-smoothed log-likelihood ratio
    * `ln(p_target / p_raw)` between a TARGET subset (rows where
    * `isTarget`) and the full raw corpus, and a document's score is its
    * mean token LLR — high-scoring docs "look like" the target domain
    * and are what importance resampling keeps. Deterministic: integer
    * counts, LLR rounded to 9dp, per-doc sum as an ordered fold (the
    * same bit-exactness discipline as [[unigramSurprisal]]).
    *
    * Shape at scale: ONE token-count aggregation carrying both raw and
    * target counts (`sum(is_t)` rides the same shuffle as the count —
    * the target pass is free), checkpointed so the totals row doesn't
    * re-expand the corpus aggregate, then a broadcast vocab join and a
    * doc-keyed fold. At web scale the token key would be a hash bucket
    * (DSIR's 10k-bucket trick) — same plan, smaller vocab table.
    */
  def dsirWeights(docs: DataFrame, isTarget: Column): DataFrame = {
    val toks = docs.select(col("doc_id"), isTarget.cast("long").as("is_t"),
        posexplode(expr("filter(split(text, ' '), t -> t != '')")))
      .toDF("doc_id", "is_t", "pos", "tok")
    val cnt = toks.groupBy("tok")
      .agg(count(lit(1)).as("cr"), sum(col("is_t")).as("ct"))
      .localCheckpoint()
    val tot = cnt.agg(count(lit(1)).as("v"), sum("cr").as("tr"), sum("ct").as("tt"))
    val llr = cnt.crossJoin(broadcast(tot))
      .select(col("tok"), round(log(
        ((col("ct") + 1) / (col("tt") + col("v"))) /
          ((col("cr") + 1) / (col("tr") + col("v")))), 9).as("w"))
    toks.join(broadcast(llr), Seq("tok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        expr("aggregate(array_sort(collect_list(w)), cast(0 as double), (a, x) -> a + x)")
          .as("sw"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("sw") / col("n_tokens"), 6).as("dsir_score"))
  }

  /** Tokenizer-coverage analysis: build the corpus top-`vocabSize`
    * unigram vocabulary (ties broken by token ascending, so the vocab
    * set is engine-reproducible) and score every document's OOV rate —
    * the share of its token OCCURRENCES outside the vocabulary. The
    * pre-tokenizer-training question "what % of the corpus does a
    * V-entry vocab cover, and which docs are full of junk tokens?".
    *
    * Output: (doc_id, n_tokens, oov_rate); docs with zero tokens never
    * appear (no occurrences to classify).
    *
    * Shape at scale: ONE token-count shuffle with full map-side combine
    * (the vocab agg), a top-V sort over the VOCABULARY (|vocab| ≪
    * corpus — a few million rows even web-scale, and Spark plans
    * orderBy+limit as TakeOrdered: per-partition heaps, never a global
    * sort-exchange), then a BROADCAST left-semi-style join of the tiny
    * vocab against the token stream and ONE doc-keyed aggregation. The
    * corpus is scanned twice (count pass + score pass) — the same two
    * passes any tokenizer trainer makes.
    */
  def vocabOovRates(docs: DataFrame, vocabSize: Int = 100): DataFrame = {
    val counts = tokens(docs).groupBy("tok").agg(count(lit(1)).as("cnt"))
    val vocab = counts.orderBy(col("cnt").desc, col("tok").asc)
      .limit(vocabSize).select(col("tok"), lit(1).as("in_vocab"))
    tokens(docs)
      .join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(when(col("in_vocab").isNull, 1.0d).otherwise(0.0d)), 6)
          .as("oov_rate"))
  }

  /** PMI collocation mining: the corpus' top bigram associations,
    * `pmi(a,b) = ln( p(ab) / (p(a)·p(b)) )` with a minimum bigram-count
    * floor (PMI of rare pairs is noise — the standard Church–Hanks
    * discipline). Phrase/terminology discovery for tokenizer vocab
    * seeding and index phrase lists.
    *
    * Shape at scale: bigrams stream out of each doc's token array inside
    * one Generate (zip_with of the two shifted slices — no self-join,
    * no positional shuffle), then ONE gram-keyed aggregation each for
    * bigram and unigram counts (map-side partial), a broadcast join of
    * the bigram table against the (vocab-sized) unigram table, and a
    * top-k. Token totals ride a one-row broadcast. */
  def pmiCollocations(docs: DataFrame, minCount: Long = 5,
                      topK: Int = 30): DataFrame = {
    val toks = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
    // shifted-slice zip: pairs (toks[i], toks[i+1]); greatest() guards the
    // empty-array slice (length -1 would throw)
    val bigrams = toks.select(explode(zip_with(
        slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
        slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
        (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val cab = bigrams.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
    val uni = toks.select(explode(col("toks")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c_tok"))
    val totals = cab.agg(sum(col("c_ab")).as("n_big"))
      .crossJoin(uni.agg(sum(col("c_tok")).as("n_tok")))
    cab.where(col("c_ab") >= minCount)
      .join(broadcast(uni.select(col("tok").as("a"), col("c_tok").as("c_a"))), "a")
      .join(broadcast(uni.select(col("tok").as("b"), col("c_tok").as("c_b"))), "b")
      .crossJoin(broadcast(totals))
      .select(col("a"), col("b"), col("c_ab"),
        round(log(
          (col("c_ab").cast("double") / col("n_big")) /
            ((col("c_a").cast("double") / col("n_tok")) *
             (col("c_b").cast("double") / col("n_tok")))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("a"), col("b"))
      .limit(topK)
  }

  /** Moving-average type-token ratio (MATTR, Covington & McFall 2010) —
    * the length-independent lexical-diversity score plain TTR is not
    * (TTR decays with document length, so it can't rank a mixed-length
    * corpus). Average, over every length-`window` sliding window of the
    * token stream, of distinct-tokens/window; documents shorter than the
    * window fall back to plain TTR. Low MATTR = repetitive, template-like
    * text — a standard curation feature next to the Gopher repetition
    * rules ([[repetitionMetrics]] catches single dominant grams; MATTR
    * catches diffuse repetition those fractions miss).
    *
    * Shape at scale: pure per-row array math inside one projection — the
    * token array is let-bound once, the window sum is an integer fold
    * over `sequence`, zero shuffles, zero joins. O(n·w) per doc is the
    * honest cost of the published metric. Determinism: the fold sums
    * INTEGER distinct counts (exact), with the single double division
    * rounded at the edge. */
  def mattr(docs: DataFrame, window: Int = 20): DataFrame =
    docs.select(col("doc_id"),
      expr("filter(split(text, ' '), t -> t != '')").as("t"))
      .where(size(col("t")) > 0)
      .select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"),
        round(when(size(col("t")) <= window,
            size(array_distinct(col("t"))).cast("double") / size(col("t")))
          .otherwise(expr(
            s"""aggregate(transform(sequence(1, size(t) - $window + 1),
                  i -> size(array_distinct(slice(t, i, $window)))),
                cast(0 as bigint), (a, x) -> a + x)"""
            ).cast("double") /
            ((size(col("t")) - window + 1) * lit(window.toDouble))), 6)
          .as("mattr"))

  /** Perplexity-curriculum buckets: split the corpus into `nBuckets`
    * difficulty tiers by bigram-LM cross-entropy ([[bigramSurprisal]] —
    * the distributed stand-in for KenLM perplexity, CCNet §4.3's bucketing
    * step), and give each tier a temperature-flattened sampling weight
    * `w_b ∝ share_b^(1/T)` (T>1 upweights the rare tails, the standard
    * multilingual/domain mixing rule). The output is the sampling plan a
    * training-data loader consumes: per-bucket doc count, token mass,
    * score range, and normalized weight.
    *
    * Shape at scale: bucket CUT POINTS come from one `percentile`
    * aggregation (a single mergeable buffer — NOT a global ntile sort,
    * which would funnel the corpus through one window task), broadcast
    * back for assignment; the per-bucket roll-up is a handful-of-rows
    * aggregation. The surprisal frame is barriered once since it feeds
    * both the cut computation and the assignment. Determinism: xent is
    * rounded upstream, Spark `percentile` is bit-identical to DuckDB
    * `quantile_cont` (both R-7 interpolation), the weight normalizer is
    * an ordered fold over the bucket shares, and the final round is 6dp. */
  def curriculumBuckets(docs: DataFrame, nBuckets: Int = 4,
                        temperature: Double = 2.0): DataFrame = {
    require(nBuckets >= 2, s"nBuckets=$nBuckets must be >= 2")
    val sur = bigramSurprisal(docs).localCheckpoint()
    val fracs = (1 until nBuckets).map(_.toDouble / nBuckets)
    val cuts = sur.agg(
      expr(s"percentile(xent, array(${fracs.mkString(", ")}))").as("cs"))
    val bucket = (1 until nBuckets).foldLeft(lit(1)) { (acc, i) =>
      acc + when(col("xent") > element_at(col("cs"), i), 1).otherwise(0)
    }
    val agg = sur.crossJoin(broadcast(cuts))
      .select(col("doc_id"), col("n_bigrams"), col("xent"), bucket.as("bucket"))
      .groupBy("bucket").agg(
        count(lit(1)).as("n_docs"),
        sum("n_bigrams").as("token_mass"),
        round(min("xent"), 6).as("xent_min"),
        round(max("xent"), 6).as("xent_max"))
    val share = agg.crossJoin(broadcast(
        agg.agg(sum("token_mass").as("tm"))))
      .withColumn("p", round(pow(col("token_mass").cast("double") / col("tm"),
        1.0 / temperature), 9))
    share.crossJoin(broadcast(share.agg(expr(
        "aggregate(array_sort(collect_list(p)), cast(0 as double), (a, x) -> a + x)")
        .as("z"))))
      .select(col("bucket"), col("n_docs"), col("token_mass"),
        col("xent_min"), col("xent_max"),
        round(col("p") / col("z"), 6).as("sample_weight"))
      .orderBy("bucket")
  }

  /** Corpus-frequency vocabulary pruning: drop hapax tokens
    * (document frequency 1 — misspellings, serial numbers, boilerplate
    * ids that bloat a tokenizer vocabulary without generalizing) and
    * near-universal tokens (df > `maxDfFrac` of the corpus — corpus-level
    * stopwords carrying no signal), and report the per-document retention:
    * total/kept/dropped token counts and the kept ratio. The preprocessing
    * twin of [[vocabOovRates]]: that one measures coverage of a top-k
    * vocab, this one decides what a df-bounded vocab keeps.
    *
    * Shape at scale: document frequency is ONE (tok, doc) distinct +
    * token-keyed count (both map-side combined); the verdict joins the
    * token stream against the df table on `tok` — deliberately NOT
    * broadcast-hinted (a web-scale vocabulary exceeds any threshold; AQE
    * may still broadcast a small one) — then folds per doc. Corpus size
    * rides a one-row broadcast. */
  def vocabPrune(docs: DataFrame, maxDfFrac: Double = 0.5): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("tok"))
    val df = toks.distinct().groupBy("tok").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    toks.join(df, Seq("tok"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"),
        (col("df") > 1 && col("df") <= col("n_docs") * maxDfFrac).as("keep"))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("kept"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("dropped"))
      .withColumn("kept_ratio",
        round(col("kept").cast("double") / col("n_tokens"), 6))
  }
}
