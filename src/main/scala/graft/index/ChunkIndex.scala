package graft.index

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.search.Fusion
import graft.tables.Tables

/** Prebuilt chunk-level BM25 index — the build/query split for passage
  * retrieval (the RAG serving query).
  *
  * s21 is the self-contained path: it re-chunks the corpus and recomputes
  * chunk-level corpus statistics on every query — correct, but at 100 TB
  * every passage query would pay an index build. The reference pays its
  * chunking/embedding cost once at indexing time and serves passages from
  * the prebuilt store (`scripts/indexing.py:471-520` builds per-passage
  * points; queries only search them). This object is that split for the
  * sparse arm: chunk once, compute the per-(term, chunk) BM25 impact
  * weights once ([[Bm25Index.build]] over the chunk table — passage dl and
  * avgdl, not document), and serve top-k passages with one pushed-filter
  * postings seek.
  *
  * Chunk identity is the same packed key s21 uses: `ck = doc_id · 2^21 +
  * chunk_ord` (collision needs a ~50M-token document at stride 24;
  * doc_id keeps 2^42 headroom). Packing keeps the whole [[Bm25Index]]
  * artifact layout — postings range-sorted with bloom filters, impact
  * weights precomputed — reusable unchanged at chunk granularity.
  */
object ChunkIndex {

  val Name = "chunks_bm25_v1"
  val ChunkOrdSpace: Long = 1L << 21

  /** s21's chunk geometry: 32-token windows, stride 24 (8-token overlap). */
  val Width = 32
  val Stride = 24

  /** The chunk table for `dataDir`: packed key + chunk text, the shared
    * input of both index builds. */
  private def chunked(spark: SparkSession, dataDir: String): DataFrame =
    graft.functions.TextOps
      .chunkWindows(Tables.documents(spark, dataDir), "doc_id", "text",
        Width, Stride)
      .select((col("doc_id") * ChunkOrdSpace + col("chunk_ord")).as("ck"),
        col("chunk_text"))

  /** Build (once) the chunk-level BM25 artifacts for `dataDir`. */
  def ensure(spark: SparkSession, dataDir: String): String =
    IndexCatalog.ensure(spark, dataDir, Name) { p =>
      Bm25Index.build(chunked(spark, dataDir), "ck", "chunk_text", p)
    }

  /** Passage top-k from the prebuilt index: postings seek (pushed In +
    * bloom on term), impact-weight sum per chunk, top-k, unpacked to
    * (doc_id, chunk_ord, score). Identical math to the self-contained s21
    * path — hash-exact same results for the same terms/k. */
  def topK(spark: SparkSession, indexDir: String, terms: Seq[String],
           k: Int): DataFrame =
    unpack(Bm25Index.topK(spark, indexDir, "ck", terms, k))

  /** Unpack the packed chunk key to (doc_id, chunk_ord), carrying every
    * other column (score) through. */
  private def unpack(scored: DataFrame): DataFrame = {
    val rest = scored.columns.filter(_ != "ck").map(col).toSeq
    scored.select(
      (expr(s"ck div $ChunkOrdSpace").cast("long").as("doc_id") +:
        pmod(col("ck"), lit(ChunkOrdSpace)).cast("long").as("chunk_ord") +:
        rest): _*)
  }

  // ---- dense arm: chunk-level TF-IDF vectors, same build/query split ----

  val DenseName = "chunks_tfidf_v1"

  /** Build (once) the chunk-level TF-IDF artifacts: L2-normalized sparse
    * chunk vectors + the chunk-corpus idf table ([[TfIdfIndex.build]] at
    * chunk granularity — idf/df/norms are over PASSAGES, not documents,
    * which is what makes a short on-topic passage outrank a long document
    * that mentions the terms once). */
  def ensureDense(spark: SparkSession, dataDir: String): String =
    IndexCatalog.ensure(spark, dataDir, DenseName) { p =>
      TfIdfIndex.build(chunked(spark, dataDir), "ck", "chunk_text", p)
    }

  /** Dense passage top-k: query embedded driver-side with the chunk-corpus
    * idf, one pushed `bucket IN (...)` seek over the chunk vectors, dot
    * product, top-k — no re-chunk, no corpus-stat recompute at query time. */
  def denseTopK(spark: SparkSession, indexDir: String, query: String,
                k: Int): DataFrame =
    unpack(TfIdfIndex.searchText(spark, indexDir, "ck", query, k))

  /** Late-interaction (MaxSim) document scoring over the chunk vectors —
    * the ColBERT scoring shape: score(doc) = Σ over query terms of the
    * MAX similarity any of the doc's chunk vectors achieves for that
    * term. With the hashed one-hot token embeddings of this index,
    * cos(term, chunk) reduces to the chunk's L2-normalized weight at the
    * term's bucket, so the whole computation is: one pushed `bucket IN`
    * seek over the vectors, a (doc,bucket) max partial-agg, a broadcast
    * join against the |terms|-row term→bucket table, and a doc-keyed
    * sum. The identical plan serves real learned token embeddings — the
    * per-term max and per-doc sum are the operator; only the similarity
    * column changes (cosine expression instead of the bucket weight). */
  def maxSimTopK(spark: SparkSession, tfidfDir: String, query: String,
                 k: Int): DataFrame = {
    import spark.implicits._
    val termBuckets = TfIdfIndex.tokensOf(query).distinct
      .map(t => (t, TfIdfIndex.bucketOf(t)))
    val tb = termBuckets.toDF("term", "bucket")
    spark.read.parquet(s"$tfidfDir/vectors")
      .where(col("bucket").isin(termBuckets.map(_._2).distinct: _*))
      .select(expr(s"ck div $ChunkOrdSpace").cast("long").as("doc_id"),
        col("bucket"), col("w"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(max(col("w")).as("mw"))
      .join(broadcast(tb), "bucket")
      .groupBy(col("doc_id"))
      .agg(round(sum(col("mw")), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Hybrid passage retrieval: RRF(k=60) of the dense TF-IDF arm and the
    * sparse BM25 arm over the SAME chunk keys, both oversampled 2× (the
    * reference fetches limit*2 per arm before fusing,
    * `scripts/indexing.py:933,943`). Both arms are prebuilt-index seeks,
    * so the fused query still never touches the raw corpus. */
  def hybridTopK(spark: SparkSession, bm25Dir: String, tfidfDir: String,
                 query: String, k: Int): DataFrame = {
    val terms = TfIdfIndex.tokensOf(query)
    val dense = TfIdfIndex.searchText(spark, tfidfDir, "ck", query, 2 * k)
    val sparse = Bm25Index.topK(spark, bm25Dir, "ck", terms, 2 * k)
    unpack(Fusion.rrf(dense, sparse, "ck", 60, k))
  }
}
