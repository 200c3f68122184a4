package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.ingest.Store
import graft.search.Bm25

/** Incrementally-maintainable BM25 index — the segment design that lets a
  * delta import refresh sparse search WITHOUT rebuilding the corpus index
  * (the reference's delta imports re-upsert only changed points into
  * Qdrant's sparse index, `scripts/indexing.py:214-260`; a full rebuild
  * per delta would be the one thing a 100 TB corpus can never afford).
  *
  * Why [[Bm25Index]] can't append: it bakes idf and length normalization
  * into per-posting impact weights at build time, so ANY new document —
  * which changes n_docs, avgdl and every matched term's df — invalidates
  * every stored weight. This index keeps the two halves apart:
  *
  *   - `seg/<k>/`  postings (term, id, dl, tf) — raw, corpus-stat-free,
  *     hence IMMUTABLE once written. Append-only; each delta becomes the
  *     next segment, term-range-sorted with a bloom filter on term so
  *     `term IN (...)` still prunes at every segment's scan.
  *   - `stats/v=<k>/`  merged term df + (n_docs, sum_dl), rewritten per
  *     append — vocabulary-sized, a vanishing fraction of the postings.
  *
  * The committed version is max(v) under `stats/`: an append writes its
  * segment FIRST and publishes `stats/v=<k+1>` last, so a crash (or a
  * concurrent reader) between the two sees the old version and ignores
  * the half-appended segment — old artifacts are never touched.
  *
  * Queries read segments `0..v-1` + the v-stats and apply idf/length
  * normalization at query time: one pushed-In+bloom scan per segment
  * (unioned), one broadcast join against the |query terms| df rows, one
  * partial-aggregated shuffle on id. Scoring math is bit-identical to
  * [[Bm25.score]]/[[Bm25Index.build]] — same formula, same operation
  * order; `sum_dl` is an exact int64 so `avgdl = sum_dl / n_docs` equals
  * the built avg — so an incrementally-grown index returns HASH-EXACT the
  * results of a from-scratch build (IndexSpec pins it; the s3c oracle is
  * the plain whole-corpus BM25 SQL).
  *
  * Semantics: append-only (new doc ids). Replacing a document needs a
  * tombstone + compaction pass (segments merge into a fresh seg/0) —
  * out of scope here; the streaming ingest path is append-mostly.
  */
object IncrementalBm25 {

  val Name = "bm25_inc_v1"

  /** Raw per-(term, doc) postings: corpus-stat-free, safe to freeze. */
  private def postingsOf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), TextOps.tokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")))
      .select(col(idCol), col("dl"), explode(col("toks")).as("term"))
      .groupBy(col("term"), col(idCol), col("dl"))
      .agg(count(lit(1)).as("tf"))

  /** Per-delta stat increments: term df plus (n_docs, sum_dl). */
  private def statsOf(postings: DataFrame, docs: DataFrame,
                      textCol: String): (DataFrame, DataFrame) = {
    // postings are distinct on (term, id): count(1) == countDistinct(id)
    val dfreq = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val corpus = docs.agg(count(lit(1)).as("n_docs"),
      sum(size(TextOps.tokens(col(textCol))).cast("long")).as("sum_dl"))
    (dfreq, corpus)
  }

  private def statsDir(root: String, v: Int) = s"$root/stats/v=$v"
  private def segDir(root: String, k: Int) = s"$root/seg/$k"

  /** Committed version: max v under stats/ (0 = uninitialized). */
  def version(spark: SparkSession, root: String): Int = {
    val dir = new java.io.File(s"$root/stats")
    if (!dir.isDirectory) 0
    else dir.listFiles().map(_.getName)
      .collect { case s if s.startsWith("v=") => s.drop(2).toInt }
      .foldLeft(0)(math.max)
  }

  /** Build segment 0 + stats v=1. */
  def init(docs: DataFrame, idCol: String, textCol: String, root: String,
           numFiles: Int = 8): Unit =
    writeVersion(docs, idCol, textCol, root, seg = 0, numFiles)

  /** Append a delta as the next segment and publish merged stats. Doc ids
    * must be new (append-only semantics — see scaladoc). */
  def append(delta: DataFrame, idCol: String, textCol: String, root: String,
             numFiles: Int = 8): Unit = {
    val spark = delta.sparkSession
    val v = version(spark, root)
    require(v > 0, s"index at $root not initialized — call init first")
    writeVersion(delta, idCol, textCol, root, seg = v, numFiles)
  }

  private def writeVersion(docs: DataFrame, idCol: String, textCol: String,
                           root: String, seg: Int, numFiles: Int): Unit = {
    val spark = docs.sparkSession
    val postings = postingsOf(docs, idCol, textCol)
    // segment first — invisible until the matching stats version lands
    Store.optimizeLayout(postings, segDir(root, seg), Seq("term", idCol),
      numFiles, bloomCols = Seq("term"))
    // re-read what was written: one source of truth for the merge
    val written = spark.read.parquet(segDir(root, seg))
    val (dfreq, corpus) = statsOf(written, docs, textCol)
    val (mergedDf, mergedCorpus) =
      if (seg == 0) (dfreq, corpus)
      else {
        val oldDf = spark.read.parquet(s"${statsDir(root, seg)}/termstats")
        val oldCorpus = spark.read.parquet(s"${statsDir(root, seg)}/corpus")
        (oldDf.unionByName(dfreq).groupBy(col("term"))
           .agg(sum(col("df")).as("df")),
         oldCorpus.unionByName(corpus)
           .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl")))
      }
    // publish: the new stats version is the commit point
    Store.optimizeLayout(mergedDf, s"${statsDir(root, seg + 1)}/termstats",
      Seq("term"), 1, bloomCols = Seq("term"))
    mergedCorpus.coalesce(1).write.mode("overwrite")
      .parquet(s"${statsDir(root, seg + 1)}/corpus")
  }

  /** BM25 top-k across all committed segments, idf/length-norm applied at
    * query time from the merged stats — hash-exact the full-rebuild
    * scores. */
  def topK(spark: SparkSession, root: String, idCol: String,
           terms: Seq[String], k: Int): DataFrame = {
    val v = version(spark, root)
    require(v > 0, s"index at $root not initialized")
    val segs = (0 until v).map(segDir(root, _))
    val stats = spark.read.parquet(s"${statsDir(root, v)}/corpus")
      .select(col("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs")).as("avgdl"))
    val dfreq = spark.read.parquet(s"${statsDir(root, v)}/termstats")
      .where(col("term").isin(terms: _*)) // |terms| rows
    spark.read.parquet(segs: _*)
      .where(col("term").isin(terms: _*)) // pushed: In(term, ...) + bloom
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("w",
        col("idf") * (col("tf") * lit(Bm25.K1 + 1)) /
          (col("tf") + lit(Bm25.K1) *
            (lit(1 - Bm25.B) + lit(Bm25.B) * col("dl") / col("avgdl"))))
      .groupBy(col(idCol))
      .agg(round(sum(col("w")), 6).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Ensure an incrementally-GROWN documents index for `dataDir`: half the
    * corpus at init, the rest appended — exercising the real maintenance
    * path while staying oracle-checkable against whole-corpus SQL. */
  def ensure(spark: SparkSession, dataDir: String): String =
    IndexCatalog.ensure(spark, dataDir, Name) { p =>
      val all = graft.tables.Tables.documents(spark, dataDir)
      init(all.where(col("doc_id") % 2 === 0), "doc_id", "text", p)
      append(all.where(col("doc_id") % 2 === 1), "doc_id", "text", p)
    }
}
