package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.Store
import graft.tables.Tables

/** Prebuilt TF-IDF embedding index — build/query split for the dense-ish
  * text-search path (reference V1/V2: passages are embedded once at
  * indexing time, `scripts/indexing.py:100-106,474-485`; queries embed only
  * the query string). `TfIdfEmbedder.searchText` is the self-contained
  * twin; it rebuilds tf/idf/norms per query. This index persists:
  *
  *   - `vectors/` (id, bucket, w) — L2-normalized sparse doc vectors,
  *     range-sorted by bucket with a bloom filter on bucket;
  *   - `idf/`     (bucket, idf)   — the 64-row corpus idf table.
  *
  * The query's buckets are pure md5 token hashes (no data dependence), so
  * the query side computes them DRIVER-SIDE and pushes a literal
  * `bucket IN (...)` into the vectors scan — the inverted-index seek. The
  * query vector itself still comes from the persisted idf table via a
  * broadcast join (≤ |query tokens| rows); no driver collect.
  */
object TfIdfIndex {

  val Name = "tfidf"
  val Dim: Int = TfIdfEmbedder.DefaultDim

  def build(docs: DataFrame, idCol: String, textCol: String, out: String,
            dim: Int = Dim, numFiles: Int = 8): Unit = {
    Store.optimizeLayout(
      TfIdfEmbedder.docVectors(docs, idCol, textCol, dim),
      s"$out/vectors", Seq("bucket", idCol), numFiles,
      bloomCols = Seq("bucket"))
    TfIdfEmbedder.idf(docs, idCol, textCol, dim)
      .coalesce(1).write.mode("overwrite").parquet(s"$out/idf")
  }

  /** Driver-side twin of `TfIdfEmbedder.bucket` (md5 hex prefix, like
    * `HashOps.tokenHash32`): first 8 md5 hex chars as int64, mod dim.
    * Must stay bit-identical to the Column version — `EmbedderSpec`
    * asserts the parity. */
  def bucketOf(token: String, dim: Int = Dim): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(token.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 8), 16) % dim).toInt
  }

  /** Whitespace tokens, empties dropped — mirrors `TextOps.tokens`. */
  def tokensOf(query: String): Seq[String] =
    query.split(" ").toSeq.filter(_.nonEmpty)

  /** Top-k text search against a prebuilt index. Hash-exact same results
    * as `TfIdfEmbedder.searchText` on the same corpus. */
  def searchText(spark: SparkSession, indexDir: String, idCol: String,
                 query: String, k: Int, dim: Int = Dim): DataFrame = {
    val qbuckets = tokensOf(query).map(bucketOf(_, dim)).distinct
    val idf = spark.read.parquet(s"$indexDir/idf")
      .where(col("bucket").isin(qbuckets: _*))

    // Query vector: literal tokens -> bucket tf -> x idf -> L2 normalize.
    // Everything after the 1-row range is broadcast-sized.
    val qtf = spark.range(1).select(lit(query).as("qtext"))
      .select(explode(graft.functions.TextOps.tokens(col("qtext"))).as("tok"))
      .select((graft.functions.HashOps.tokenHash32(col("tok")) % dim)
        .cast("int").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("tf"))
    val qweighted = qtf.join(idf, "bucket").withColumn("w", col("tf") * col("idf"))
    val qnorm = qweighted.agg(sqrt(sum(col("w") * col("w"))).as("norm"))
    val qv = qweighted.crossJoin(broadcast(qnorm))
      .select(col("bucket"), (col("w") / col("norm")).as("qw"))

    spark.read.parquet(s"$indexDir/vectors")
      .where(col("bucket").isin(qbuckets: _*)) // pushed: In(bucket, ...)
      .join(broadcast(qv), "bucket")
      .groupBy(col(idCol))
      .agg(round(sum(col("w") * col("qw")), 6).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Ensure the documents-table index for `dataDir` exists (built once). */
  def ensure(spark: SparkSession, dataDir: String): String =
    IndexCatalog.ensure(spark, dataDir, Name)(
      build(Tables.documents(spark, dataDir), "doc_id", "text", _))
}
