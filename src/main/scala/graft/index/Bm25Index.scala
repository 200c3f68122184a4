package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.ingest.Store
import graft.search.Bm25
import graft.tables.Tables

/** Prebuilt BM25 inverted index — the build/query split for sparse search.
  *
  * The reference embeds the corpus into Qdrant's `"bm25"` sparse index once
  * at indexing time (`scripts/indexing.py:116-122,474-485`); queries only
  * touch the postings for their own terms. `Bm25.score` is the
  * self-contained equivalent (correct, but recomputes corpus statistics on
  * every query — at 100 TB every search would pay an index build). This
  * object persists the three artifacts a query actually needs:
  *
  *   - `postings/`  (term, id, dl, tf) — range-sorted by term with a bloom
  *     filter on term, so `term IN (...)` prunes to the query's posting
  *     lists at the parquet scan (the inverted-index seek, as layout);
  *   - `termstats/` (term, df) — document frequency per term;
  *   - `corpus/`    (n_docs, avgdl) — 1-row global stats.
  *
  * Query cost is then O(|postings of the query terms|): one pushed-filter
  * scan, one broadcast join, one partial-aggregated shuffle on id.
  */
object Bm25Index {

  // versioned: v2 added the precomputed impact weight column; v3 added
  // the per-term MAX impact (`maxw`) to termstats — the MaxScore upper
  // bound ([[topKMaxScore]]). Layout changes, so older artifacts must
  // never be reused.
  val Name = "bm25_v3"

  def build(docs: DataFrame, idCol: String, textCol: String, out: String,
            numFiles: Int = 8): Unit = {
    val base = docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")))

    val tf = base
      .select(col(idCol), col("dl"), explode(col("toks")).as("term"))
      .groupBy(col("term"), col(idCol), col("dl"))
      .agg(count(lit(1)).as("tf"))

    // tf is distinct on (term, id): count(1) == countDistinct(id).
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))

    val stats = base.agg(count(lit(1)).as("n_docs"),
      avg(col("dl").cast("double")).as("avgdl"))
    stats.write.mode("overwrite").parquet(s"$out/corpus")

    // Impact-ready postings: idf, tf saturation and length normalization
    // depend only on (term, doc, corpus) — ALL known at build time — so the
    // final per-(term, doc) BM25 weight is precomputed into the posting row
    // (the classic impact-sorted-index design). A query is then one pushed
    // scan + one partial-aggregated shuffle: no broadcast builds, no
    // corpus-stats join, nothing per-query but the sum.
    val postings = tf
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("w",
        col("idf") * (col("tf") * lit(Bm25.K1 + 1)) /
          (col("tf") + lit(Bm25.K1) *
            (lit(1 - Bm25.B) + lit(Bm25.B) * col("dl") / col("avgdl"))))
      .select(col("term"), col(idCol), col("dl"), col("tf"), col("w"))
    Store.optimizeLayout(postings, s"$out/postings", Seq("term", idCol),
      numFiles, bloomCols = Seq("term"))

    // termstats with the per-term MAX impact weight — the upper bound
    // MaxScore prunes with ([[topKMaxScore]]; impact-ordered engines
    // store exactly this per list). Aggregated from the just-written
    // postings (one columnar (term, w) pass, distinct on (term, id), so
    // count(1) is still df), not a recompute of the weight pipeline.
    val ts = docs.sparkSession.read.parquet(s"$out/postings")
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), max(col("w")).as("maxw"))
    Store.optimizeLayout(ts, s"$out/termstats", Seq("term"), 1,
      bloomCols = Seq("term"))
  }

  /** BM25 top-k against a prebuilt index: scan the query terms' postings
    * (pushed In + bloom), sum the precomputed impact weights per doc, take
    * k. Identical math to [[Bm25.score]] (the weight formula runs at build
    * with the same operations) — hash-exact same results. */
  def topK(spark: SparkSession, indexDir: String, idCol: String,
           terms: Seq[String], k: Int): DataFrame =
    spark.read.parquet(s"$indexDir/postings")
      .where(col("term").isin(terms: _*)) // pushed: In(term, ...) + bloom
      .groupBy(col(idCol))
      .agg(round(sum(col("w")), 6).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)

  /** Cursor-paged [[topK]] — Elasticsearch `search_after` semantics: the
    * k rows strictly AFTER position (afterScore, afterId) in the
    * (score desc, id asc) total order. This is how deep pagination must
    * work at scale: page N costs the SAME plan as page 1 (postings
    * seek → partial agg → cursor filter → top-k), where OFFSET-paging
    * drags offset+k rows through the final ordering on every page —
    * O(k) vs O(N·k) at depth N. The cursor filter sits BEFORE the
    * top-k, so the per-partition partial top-k (WindowGroupLimit /
    * TakeOrderedAndProject) works on post-cursor rows only. The total
    * order is deterministic (6-dp rounded scores, id tiebreak), so
    * chained pages tile the full result with no gaps or repeats — the
    * oracle states page≡OFFSET equality in SQL. */
  def topKAfter(spark: SparkSession, indexDir: String, idCol: String,
                terms: Seq[String], k: Int,
                afterScore: Double, afterId: Long): DataFrame =
    spark.read.parquet(s"$indexDir/postings")
      .where(col("term").isin(terms: _*)) // pushed: In(term, ...) + bloom
      .groupBy(col(idCol))
      .agg(round(sum(col("w")), 6).as("score"))
      .where(col("score") < afterScore ||
        (col("score") === afterScore && col(idCol) > afterId))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)

  /** Batched multi-query BM25 — the sparse twin of
    * [[graft.search.Ann.ivfTopKBatched]]: ONE plan answers a whole query
    * TABLE, which is the legitimate answer to Spark's per-job scheduling
    * floor (a per-query loop pays it |Q| times; the reference's HTTP
    * handler pays a per-request round-trip the same way,
    * `app/api/endpoints/search.py:104-132`).
    *
    * `queries` is (qidCol, termCol) rows — one row per query term. The
    * batch's distinct terms (batch-bounded, collected driver-side like a
    * query literal) prune the postings scan with the same pushed
    * `In(term, ...)` + bloom as the single-query path; the query table
    * broadcasts onto the postings, scores partial-agg sum per (qid, doc),
    * and per-query top-k runs as ONE rank filter — Spark's WindowGroupLimit
    * keeps it a partial top-k per partition, never a full sort.
    * Per-query results are hash-identical to [[topK]] (IndexSpec pins the
    * loop equality). */
  def topKBatched(spark: SparkSession, indexDir: String, idCol: String,
                  queries: DataFrame, qidCol: String, termCol: String,
                  k: Int, ordered: Boolean = true): DataFrame = {
    val terms = queries.select(col(termCol)).distinct()
      .collect().map(_.getString(0)).toSeq
    if (terms.isEmpty)
      return spark.read.parquet(s"$indexDir/postings").where(lit(false))
        .select(col(idCol)).crossJoin(queries.select(col(qidCol)).limit(0))
        .select(col(qidCol), col(idCol), lit(0.0).as("score"))
    val rank = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol))
      .orderBy(col("score").desc, col(idCol).asc)
    spark.read.parquet(s"$indexDir/postings")
      .where(col("term").isin(terms: _*)) // pushed: In(term, ...) + bloom
      // distinct: a duplicated (qid, term) input row must not make the
      // join fan out and double-count that term's weight in sum(w)
      .join(broadcast(
        queries.select(col(qidCol), col(termCol).as("term")).distinct()),
        "term")
      .groupBy(col(qidCol), col(idCol))
      .agg(round(sum(col("w")), 6).as("score"))
      .withColumn("__rn", row_number().over(rank))
      .where(col("__rn") <= k)
      .select(col(qidCol), col(idCol), col("score"))
      // ordered=false for fusion callers: skips the RANGE exchange (and
      // its boundary-sampling job) and keeps the qid hash partitioning
      // alive for the downstream rank windows (see Ann.ivfTopKBatched)
      .transform(df =>
        if (ordered) df.orderBy(col(qidCol), col("score").desc, col(idCol).asc)
        else df)
  }

  /** BM25 top-k with MAXSCORE pruning (Turtle & Flood's upper-bound
    * candidate elimination, the set-at-a-time form modern impact-ordered
    * engines run — Lucene's WAND/MaxScore `TopScoreDocCollector`): docs
    * are fully scored ONLY when they contain at least one ESSENTIAL
    * term, and the result is PROVABLY the exact [[topK]] — the oracle is
    * the plain exact-BM25 SQL.
    *
    * The argument: let U(t) be term t's maximum impact weight (stored
    * per-term in the v3 termstats artifact — a point read, never a
    * postings pass), terms sorted U desc. θ = the k-th best FULL score
    * among docs holding t1 (a valid lower bound of the true k-th best —
    * any subset's k-th best is). Essential terms = the minimal prefix
    * t1..tp with Σ U(t_{p+1}..t_n) < θ: a doc containing only
    * non-essential terms scores ≤ that suffix sum < θ ≤ the true k-th
    * best, so it cannot place — strictly, so ties are safe (a 1e-6 guard
    * absorbs the 6-dp score rounding). Docs in no essential list are
    * never scored.
    *
    * Why it matters at scale: a query mixing one rare term with common
    * ones (the dominant real-query shape) scores only the rare term's
    * posting list instead of the union — the common terms' corpus-sized
    * lists are READ (their weights complete the candidates' scores) but
    * never drive candidate generation, so the partial-agg shuffle is
    * candidate-sized, not union-sized; with per-list impact ordering the
    * read side would prune too. θ costs one k-row collect over the
    * t1-docs subset (t1 = highest max-impact ≈ rarest list — the
    * smallest one); the UB read is |terms| rows. When pruning cannot
    * help (all terms essential — e.g. uniformly common terms, or fewer
    * than k docs hold t1 so θ is unbounded), the plan degrades to
    * exactly [[topK]]'s. */
  def topKMaxScore(spark: SparkSession, indexDir: String, idCol: String,
                   terms: Seq[String], k: Int): DataFrame = {
    val posts = spark.read.parquet(s"$indexDir/postings")
      .where(col("term").isin(terms: _*)) // pushed: In(term, ...) + bloom
    // per-term upper bounds: a point read of the termstats artifact
    // (query-literal-sized, like the query terms themselves)
    val ubs = spark.read.parquet(s"$indexDir/termstats")
      .where(col("term").isin(terms: _*))
      .select(col("term"), col("maxw"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .sortBy { case (t, u) => (-u, t) }
    val exact = () => posts
      .groupBy(col(idCol))
      .agg(round(sum(col("w")), 6).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
    if (ubs.length <= 1) return exact() // one list: nothing to prune
    // θ: k-th best FULL score over docs holding the top-UB term (its
    // list is the candidate seed — typically the rarest, smallest one)
    val t1 = ubs.head._1
    val t1Docs = posts.where(col("term") === t1).select(col(idCol)).distinct()
    val seedTop = posts.join(broadcast(t1Docs), Seq(idCol))
      .groupBy(col(idCol)).agg(round(sum(col("w")), 6).as("score"))
      .orderBy(col("score").desc, col(idCol).asc).limit(k)
      .collect()
    if (seedTop.length < k) return exact() // θ unbounded — no pruning
    val theta = seedTop.map(_.getDouble(1)).min
    // minimal essential prefix: suffix(i) = Σ U over terms i..n-1
    val suffix = ubs.map(_._2).scanRight(0.0)(_ + _)
    val p = (1 to ubs.length)
      .find(i => suffix(i) < theta - 1e-6).getOrElse(ubs.length)
    val essential = ubs.take(p).map(_._1)
    val cands = posts.where(col("term").isin(essential: _*))
      .select(col(idCol)).distinct()
    posts.join(broadcast(cands), Seq(idCol))
      .groupBy(col(idCol))
      .agg(round(sum(col("w")), 6).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** [[topKMaxScore]] × [[topKBatched]]: MaxScore-pruned BM25 for a
    * whole query BATCH — per-qid candidate-sized shuffles at batched
    * throughput. Same exactness argument per qid (θ from the qid's own
    * t1-doc top-k, essential-prefix elimination, 1e-6 tie guard), so
    * per-qid results are PROVABLY identical to [[topKBatched]] /
    * [[topK]] (the spec pins both equalities).
    *
    * Plan shape: TWO batch-bounded collects (the per-term upper bounds —
    * |batch terms| rows — and the seed pass's per-qid t1-doc top-k —
    * |Q|·k rows), then ONE final plan whose partial-agg shuffle carries
    * only (qid, candidate) rows: a qid mixing one rare with common
    * terms contributes its rare list's docs, not the union's. The seed
    * pass itself is one plan for ALL qids (t1-doc sets equi-join the
    * broadcast (qid, term) rows, full scores aggregate per (qid, doc),
    * per-qid rank ≤ k). Degenerate qids — single-term, θ unbounded
    * (fewer than k docs hold t1), or nothing prunable — keep all terms
    * essential and just ride the same final plan as [[topKBatched]]'s
    * rows. Driver state: batch terms, UBs, |Q|·k seed rows — all
    * request-sized, the standing "query literal" contract. */
  def topKMaxScoreBatched(spark: SparkSession, indexDir: String,
                          idCol: String, queries: Seq[(Long, Seq[String])],
                          k: Int): DataFrame = {
    import spark.implicits._
    val rank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("score").desc, col(idCol).asc)
    // duplicate qid ENTRIES merge into one term set (first-occurrence
    // order) — without this, each duplicate entry would contribute its
    // own (qid, term) rows to the broadcast frames and the sum(w)
    // aggregation would silently double-count shared terms
    val perQid = queries.map(_._1).distinct.map { q =>
      (q, queries.collect { case (`q`, ts) => ts }.flatten.distinct)
    }
    val allTerms = perQid.flatMap(_._2).distinct
    if (allTerms.isEmpty)
      return spark.read.parquet(s"$indexDir/postings").where(lit(false))
        .select(col(idCol)).crossJoin(Seq.empty[Long].toDF("qid").limit(0))
        .select(col("qid"), col(idCol), lit(0.0).as("score"))
    val posts = spark.read.parquet(s"$indexDir/postings")
      .where(col("term").isin(allTerms: _*)) // pushed: In(term, ...) + bloom
    // collect 1: per-term upper bounds for the whole batch
    val ub = spark.read.parquet(s"$indexDir/termstats")
      .where(col("term").isin(allTerms: _*))
      .select(col("term"), col("maxw"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val ubsOf = perQid.map { case (q, ts) =>
      q -> ts.filter(ub.contains).sortBy(t => (-ub(t), t))
    }.toMap
    // seed pass, one plan for all qids: full scores of each qid's
    // t1-docs, per-qid top-k — collect 2 (|Q|·k rows)
    val t1Df = broadcast(perQid.flatMap { case (q, _) =>
      ubsOf(q).headOption.map(t1 => (q, t1)) }.toDF("qid", "term"))
    val qtermDf = broadcast(perQid.flatMap { case (q, ts) =>
      ts.map(t => (q, t)) }.toDF("qid", "term"))
    val t1Docs = posts.join(t1Df, "term").select(col("qid"), col(idCol)).distinct()
    val seedTop = posts.join(qtermDf, "term")
      .join(t1Docs, Seq("qid", idCol), "left_semi")
      .groupBy(col("qid"), col(idCol))
      .agg(round(sum(col("w")), 6).as("score"))
      .withColumn("__rn", row_number().over(rank))
      .where(col("__rn") <= k)
      .groupBy(col("qid"))
      .agg(min(col("score")).as("theta"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // per-qid essential prefix (driver arithmetic over request-sized state)
    val essDf = broadcast(perQid.flatMap { case (q, ts) =>
      val ubs = ubsOf(q)
      val essential = seedTop.get(q) match {
        case Some((theta, n)) if n >= k && ubs.length > 1 =>
          val suffix = ubs.map(ub).scanRight(0.0)(_ + _)
          val p = (1 to ubs.length)
            .find(i => suffix(i) < theta - 1e-6).getOrElse(ubs.length)
          ubs.take(p)
        case _ => ts // θ unbounded / single list: no pruning, stay exact
      }
      essential.map(t => (q, t))
    }.toDF("qid", "term"))
    // final plan: candidates from essential lists only, completed scores
    // from the qid's full term set
    val cands = posts.join(essDf, "term").select(col("qid"), col(idCol)).distinct()
    posts.join(qtermDf, "term")
      .join(cands, Seq("qid", idCol), "left_semi")
      .groupBy(col("qid"), col(idCol))
      .agg(round(sum(col("w")), 6).as("score"))
      .withColumn("__rn", row_number().over(rank))
      .where(col("__rn") <= k)
      .select(col("qid"), col(idCol), col("score"))
      .orderBy(col("qid"), col("score").desc, col(idCol).asc)
  }

  /** Pseudo-relevance-feedback query EXPANSION — the RM3-shaped PRF loop
    * (Lavrenko & Croft relevance models; Anserini/Terrier run exactly
    * this two-pass plan): the base query's top-`fbDocs` docs are assumed
    * relevant, the `nExp` highest-impact terms of those docs (summed
    * stored BM25 weight, the original terms excluded, term-asc
    * tiebreak) join the query, and the EXPANDED term set re-runs
    * [[topK]]. Deterministic end to end (6-dp rounding before every
    * ordering), so the whole loop is SQL-replayable — the oracle states
    * both passes.
    *
    * Scale shape: pass 1 is [[topK]] (pushed postings seek). Expansion
    * vocabulary comes from the FEEDBACK DOCS' OWN TEXT (a pushed
    * `id IN (fb)` point read of the docs table — fbDocs rows), never
    * from a doc-major postings pass (postings are term-sorted; a
    * by-doc scan of them would read the corpus). Their candidate terms
    * then seek the postings the normal way (`term IN`, fb-vocabulary
    * sized) joined to the fb-doc broadcast, so expansion costs two
    * point reads + one tiny agg. Driver state: fb ids (fbDocs), fb
    * vocabulary (the distinct tokens of fbDocs docs), both
    * feedback-sized — the same "query literal" contract as the terms
    * argument itself. */
  def prfExpandTopK(spark: SparkSession, indexDir: String, docs: DataFrame,
                    idCol: String, textCol: String, terms: Seq[String],
                    fbDocs: Int, nExp: Int, k: Int): DataFrame = {
    val fbIds = topK(spark, indexDir, idCol, terms, fbDocs)
      .select(col(idCol)).collect().map(_.getLong(0)).toSeq
    if (fbIds.isEmpty) return topK(spark, indexDir, idCol, terms, k)
    val fbTerms = docs.where(col(idCol).isin(fbIds: _*)) // pushed In(id)
      .select(explode(array_distinct(TextOps.tokens(col(textCol)))).as("term"))
      .where(!col("term").isin(terms: _*))
      .distinct().collect().map(_.getString(0)).toSeq
    val expansion =
      if (fbTerms.isEmpty) Seq.empty[String]
      else {
        import spark.implicits._
        spark.read.parquet(s"$indexDir/postings")
          .where(col("term").isin(fbTerms: _*)) // pushed In(term) + bloom
          .join(broadcast(fbIds.toDF(idCol)), Seq(idCol))
          .groupBy(col("term"))
          .agg(round(sum(col("w")), 6).as("ew"))
          .orderBy(col("ew").desc, col("term").asc)
          .limit(nExp)
          .collect().map(_.getString(0)).toSeq
      }
    topK(spark, indexDir, idCol, terms ++ expansion, k)
  }

  /** Exact-phrase top-k through the inverted index: candidates are docs
    * whose postings contain EVERY phrase term — one pushed-`In`+bloom
    * postings scan and one partial-aggregated shuffle, never a corpus
    * scan for terms the document lacks — confirmed by token adjacency
    * against the documents table and ranked by the summed BM25 impact
    * weights of the phrase terms (the classic two-stage phrase plan:
    * index seek proposes, positions/adjacency verify). The reference
    * exposes phrase semantics as quoted exact matching over its payload
    * index (`scripts/indexing.py:383-443` full-text config); adjacency
    * here is the padded-substring test on the already-normalized text,
    * identical in any engine.
    *
    * The candidate set (docs holding ALL terms) is broadcast, so the
    * confirm join adds no shuffle; at 100 TB the documents side seeks by
    * the doc-id-sorted layout (`Store.optimizeLayout`) instead of
    * scanning. */
  def phraseTopK(spark: SparkSession, indexDir: String, docs: DataFrame,
                 idCol: String, textCol: String, phrase: Seq[String],
                 k: Int): DataFrame = {
    val terms = phrase.distinct
    val cand = spark.read.parquet(s"$indexDir/postings")
      .where(col("term").isin(terms: _*)) // pushed: In(term, ...) + bloom
      .groupBy(col(idCol))
      // postings are distinct on (term, id): count(1) counts matched terms
      .agg(count(lit(1)).as("__nt"), round(sum(col("w")), 6).as("score"))
      .where(col("__nt") === terms.size)
      .drop("__nt")
    docs.join(broadcast(cand), Seq(idCol))
      .where(concat(lit(" "), col(textCol), lit(" "))
        .contains(" " + phrase.mkString(" ") + " "))
      .select(col(idCol).as("id"), col("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }

  /** Ensure the documents-table index for `dataDir` exists (built once). */
  def ensure(spark: SparkSession, dataDir: String): String =
    IndexCatalog.ensure(spark, dataDir, Name)(
      build(Tables.documents(spark, dataDir), "doc_id", "text", _))
}
