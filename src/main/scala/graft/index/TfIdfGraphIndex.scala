package graft.index

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.search.Ann

/** kNN graph over the engine's TEXT embedding space — the artifact behind
  * `mode=graph` on `/api/query`. The reference serves every text query
  * through its HNSW graph: the query string embeds into the same space the
  * graph was built in, the upper layers pick entry points, and the layer-0
  * walk returns the top-k (`scripts/indexing.py:326-340`,
  * `app/api/endpoints/search.py:51-97`). The corpus `embeddings` table
  * can't play that role for text queries — nothing embeds a STRING into
  * it — so the graph the text route walks is built over the engine's
  * deterministic text embedder: [[TfIdfIndex]]'s L2-normalized doc
  * vectors, densified to `dim` (64) floats per doc.
  *
  * Layout under the catalog entry:
  *
  *   - `vectors/` (vec_id, embedding float[dim]) — dense tfidf doc
  *     vectors, range-sorted by vec_id with small row groups, so the
  *     seek-serving path's `vec_id IN (...)` lookups prune row groups;
  *   - `edges/`   (src, dst, score, rank) — [[Ann.knnGraph]] over those
  *     vectors (centroids = first 10 docs' vectors, the engine-independent
  *     rule every graph artifact here uses), in the `_srt` src-sorted
  *     seek layout of [[KnnGraphIndex]].
  *
  * Build cost is one corpus pass (sparse→dense pivot) plus the standard
  * IVF-blocked kNN candidate join — amortized across every graph-mode
  * query, exactly like [[KnnGraphIndex]]. Scale shape at serving time is
  * the walk's: per-hop work is O(beam·k), independent of corpus size.
  */
object TfIdfGraphIndex {

  // v2: + persisted coarse entry layer (mod-16 subset) — the inline
  // pmod filter can't prune row groups, so without the artifact every
  // query's entry selection READ the whole vectors table
  val Name = "tfidf_graph_v2"
  val Dim: Int = TfIdfIndex.Dim

  /** Coarse-layer sampling modulus — the HNSW upper-layer analogue
    * (serving walks start from the top-3 of this subset). */
  val CoarseMod = 16

  /** Sparse (idCol, bucket, w) -> dense (vec_id, embedding float[Dim]).
    * One map_from_entries per doc + a generated fill — no shuffle beyond
    * the groupBy on the vectors' natural key. */
  private def densify(sparse: DataFrame, idCol: String): DataFrame =
    sparse
      .groupBy(col(idCol).as("vec_id"))
      .agg(map_from_entries(collect_list(
        struct(col("bucket"), col("w")))).as("m"))
      .select(col("vec_id"),
        expr(s"transform(sequence(0, ${Dim - 1}), " +
          "b -> cast(coalesce(element_at(m, b), 0.0d) as float))")
          .as("embedding"))

  /** Embed a document frame into the graph's FROZEN text-embedding space:
    * sparse TF-IDF against the corpus idf artifact (the model trained at
    * [[TfIdfIndex]] build time — new docs never move the space, exactly
    * like the reference's frozen `bge-small` weights), densified to
    * float[Dim]. Docs with NO in-vocabulary token zero-fill (V6
    * semantics: a zero vector scores 0.0 everywhere, so it parks in the
    * graph without distorting any walk). Over the training corpus itself
    * this reproduces the stored build vectors (EmbedderSpec pins the
    * sparse identity; the float cast absorbs sub-ulp aggregation-order
    * noise). */
  def embedDocsDense(spark: SparkSession, dataDir: String, docs: DataFrame,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val idx = TfIdfIndex.ensure(spark, dataDir)
    val idfTable = spark.read.parquet(s"$idx/idf")
    val dense = densify(
      TfIdfEmbedder.docVectorsWithIdf(docs, idCol, textCol, idfTable, Dim),
      idCol)
    docs.select(col(idCol).cast("long").as("vec_id")).distinct()
      .join(dense, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("embedding"),
          expr(s"transform(sequence(0, ${Dim - 1}), b -> cast(0.0d as float))"))
          .as("embedding"))
  }

  private def ensureDir(spark: SparkSession, dataDir: String): String =
    IndexCatalog.ensure(spark, dataDir, Name) { out =>
      val tfidf = TfIdfIndex.ensure(spark, dataDir)
      val dense = densify(spark.read.parquet(s"$tfidf/vectors"), "doc_id")
      dense.repartitionByRange(8, col("vec_id"))
        .sortWithinPartitions(col("vec_id"))
        .write.mode(SaveMode.Overwrite)
        .option("parquet.block.size", (1 << 20).toString)
        .parquet(s"$out/vectors")
      val stored = spark.read.parquet(s"$out/vectors")
      // the coarse entry layer as its own artifact: 1/CoarseMod of the
      // rows, so entry selection is a 6% scan as I/O, not a full read
      // with a post-scan filter (hierEntriesFrom scaladoc)
      stored.where(pmod(col("vec_id"), lit(CoarseMod)) === lit(0))
        .repartitionByRange(2, col("vec_id"))
        .sortWithinPartitions(col("vec_id"))
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$out/coarse")
      val centroids = stored.where(col("vec_id") < 10)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Ann.knnGraph(stored, centroids, 3, 5)
        .repartitionByRange(8, col("src"))
        .sortWithinPartitions(col("src"), col("rank"))
        .write.mode(SaveMode.Overwrite)
        .option("parquet.block.size", (1 << 20).toString)
        .parquet(s"$out/edges")
    }

  /** Dense tfidf doc vectors (vec_id, embedding). */
  def vectors(spark: SparkSession, dataDir: String): DataFrame =
    spark.read.parquet(s"${ensureDir(spark, dataDir)}/vectors")

  /** The kNN edge artifact over those vectors (src, dst, score, rank). */
  def edges(spark: SparkSession, dataDir: String): DataFrame =
    spark.read.parquet(s"${ensureDir(spark, dataDir)}/edges")

  /** The prebuilt coarse entry layer (vec_id % CoarseMod == 0 subset). */
  def coarse(spark: SparkSession, dataDir: String): DataFrame =
    spark.read.parquet(s"${ensureDir(spark, dataDir)}/coarse")

  /** The query string embedded into the graph's space, as a 1-row (qvec)
    * frame — dense form of [[TfIdfIndex.queryWeights]] (driver-side: md5
    * buckets + the cached 64-row idf table; the cluster is touched only
    * by the walk). Empty map (no query token in the corpus) densifies to
    * the zero vector, which scores 0.0 everywhere (V6 semantics). */
  def queryVec(spark: SparkSession, dataDir: String, query: String): DataFrame = {
    import spark.implicits._
    val qw = TfIdfIndex.queryWeights(
      spark, TfIdfIndex.ensure(spark, dataDir), query)
    val arr = Array.tabulate(Dim)(b => qw.getOrElse(b, 0.0).toFloat)
    Seq(arr.toSeq).toDF("qvec")
      .select(col("qvec").cast("array<float>").as("qvec"))
  }

  // Incrementally-GROWN twin of the one-shot artifact: the same frozen
  // embedding space, maintained by [[IncrementalKnn]] appends instead of
  // a rebuild. This is `mode=graph`'s freshness story — the reference
  // re-inserts new points into its live HNSW (`scripts/indexing.py:
  // 214-260`) rather than rebuilding, and at 100 TB a nightly delta can
  // never afford the rebuild either.
  val IncName = "tfidf_graph_inc_v1"

  /** Whole-corpus grown graph for `dataDir` (thirds: init + two appends
    * of frozen-idf embedded docs), memoized — by [[IncrementalKnn]]'s
    * exactness argument the merged edges hash-equal the one-shot
    * [[ensureDir]] build, so the s28 walk oracle applies VERBATIM to a
    * walk over this root (`s28b_graph_grown`). */
  def ensureGrown(spark: SparkSession, dataDir: String): String =
    IndexCatalog.ensure(spark, dataDir, IncName) { root =>
      val docs = graft.tables.Tables.documents(spark, dataDir)
      val dense = embedDocsDense(spark, dataDir, docs)
      val centroids = dense.where(col("vec_id") < 10)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      IncrementalKnn.init(
        dense.where(pmod(col("vec_id"), lit(3)) === 0), centroids, root, 3, 5)
      IncrementalKnn.append(
        dense.where(pmod(col("vec_id"), lit(3)) === 1), root, 3, 5)
      IncrementalKnn.append(
        dense.where(pmod(col("vec_id"), lit(3)) === 2), root, 3, 5)
    }

  /** N query strings embedded as (qid, qvec) — the batched twin of
    * [[queryVec]] (still all driver-side: md5 buckets + the cached idf
    * table; the tiny literal table broadcasts into the walk). */
  def queryVecs(spark: SparkSession, dataDir: String,
                queries: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    val idx = TfIdfIndex.ensure(spark, dataDir)
    queries.map { case (qid, q) =>
      val qw = TfIdfIndex.queryWeights(spark, idx, q)
      (qid, Array.tabulate(Dim)(b => qw.getOrElse(b, 0.0).toFloat).toSeq)
    }.toDF("qid", "qvec")
      .select(col("qid"), col("qvec").cast("array<float>").as("qvec"))
  }
}
