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

  // versioned: v2 added the precomputed impact weight column — a layout
  // change, so v1 artifacts must never be reused
  val Name = "bm25_v2"

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
    Store.optimizeLayout(dfreq, s"$out/termstats", Seq("term"), 1,
      bloomCols = Seq("term"))

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
      .join(broadcast(queries.select(col(qidCol), col(termCol).as("term"))),
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
