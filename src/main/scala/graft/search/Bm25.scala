package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Okapi BM25 scoring over a document table (reference §2.9 V3/V5: the
  * Qdrant `"bm25"` sparse vector arm, `/root/reference/scripts/indexing.py:
  * 116-122, 474-485, 865-899`).
  *
  * Spark-first design: instead of materializing per-document sparse
  * vectors and dotting them with a query vector, we score declaratively —
  * explode tokens, **filter to the query terms before any shuffle** (at
  * 100 TB this prunes ~everything at the scan), partial-aggregate term
  * frequencies map-side, then join the tiny per-term document-frequency
  * table back with a broadcast. Two shuffles total, both on heavily
  * pre-filtered data; corpus stats (N, avgdl) are a 1-row broadcast.
  */
object Bm25 {
  val K1 = 1.2
  val B = 0.75

  /** Per-doc BM25 scores for `terms` over `docs(idCol, textCol)`.
    * Output: (idCol, score double rounded to 6dp), one row per doc that
    * matches at least one term. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            terms: Seq[String]): DataFrame =
    scoreTokens(docs.select(col(idCol),
      TextOps.tokens(col(textCol)).as("__toks")), idCol, "__toks", terms)

  /** [[score]] over a PRE-TOKENIZED table (idCol, toksCol) — for callers
    * whose rows are already token arrays (chunk windows): skips the
    * join-to-string/re-split round trip. Same expressions, same values. */
  def scoreTokens(docs: DataFrame, idCol: String, toksCol: String,
                  terms: Seq[String]): DataFrame = {
    val base = docs
      .select(col(idCol), col(toksCol).as("toks"))
      .withColumn("dl", size(col("toks")))

    // 1-row corpus stats, broadcast to every score computation.
    val stats = base.agg(
      count("*").as("n_docs"),
      avg(col("dl").cast("double")).as("avgdl"))

    val tf = base
      .select(col(idCol), col("dl"), explode(col("toks")).as("term"))
      .where(col("term").isin(terms: _*)) // prune before the shuffle
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count("*").as("tf"))

    // tf is grouped by (id, dl, term), so ids are distinct per term:
    // count(1) == countDistinct(id) without the expand + double-aggregate.
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))

    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("w",
        col("idf") * (col("tf") * lit(K1 + 1)) /
          (col("tf") + lit(K1) * (lit(1 - B) + lit(B) * col("dl") / col("avgdl"))))
      .groupBy(col(idCol))
      .agg(round(sum(col("w")), 6).as("score"))
  }

  /** BM25 top-k: deterministic ordering (score desc, id asc). */
  def topK(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k: Int): DataFrame =
    score(docs, idCol, textCol, terms)
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)

  /** [[topK]] over a pre-tokenized table (see [[scoreTokens]]). */
  def topKTokens(docs: DataFrame, idCol: String, toksCol: String,
                 terms: Seq[String], k: Int): DataFrame =
    scoreTokens(docs, idCol, toksCol, terms)
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)

  /** More-like-this: use a stored document AS the query (Lucene/
    * Elasticsearch's classic `more_like_this`) — take the anchor's
    * `nTerms` most representative terms (tf desc, term asc tie-break)
    * and BM25-rank the rest of the corpus against them. The query terms
    * are data-dependent, so they stay a PLAN INPUT: a broadcast
    * nTerms-row frame semi-joined into the token stream — no driver
    * collect, the whole thing is one job.
    *
    * Scale shape: identical to [[score]] (the term semi-join prunes the
    * exploded stream before its first shuffle) plus one doc-local term
    * count for the anchor — the anchor filter is a pushed-down point
    * predicate on the scan. Document frequency is computed over the
    * candidate set (anchor excluded), mirrored exactly by the oracle. */
  def moreLikeThis(docs: DataFrame, idCol: String, textCol: String,
                   anchorId: Long, nTerms: Int, k: Int): DataFrame = {
    val base = docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")))
    val stats = base.agg(
      count("*").as("n_docs"),
      avg(col("dl").cast("double")).as("avgdl"))
    val anchorTerms = docs.where(col(idCol) === anchorId)
      .select(explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("atf"))
      .orderBy(col("atf").desc, col("term").asc)
      .limit(nTerms)
      .select("term")
    val tf = base
      .select(col(idCol), col("dl"), explode(col("toks")).as("term"))
      .join(broadcast(anchorTerms), "term")
      .where(col(idCol) =!= anchorId)
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count("*").as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("w",
        col("idf") * (col("tf") * lit(K1 + 1)) /
          (col("tf") + lit(K1) * (lit(1 - B) + lit(B) * col("dl") / col("avgdl"))))
      .groupBy(col(idCol))
      .agg(round(sum(col("w")), 6).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
