package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.HashOps

/** JSON ingestion (reference §2.1 S1–S4): the reference loads a JSON array
  * file (`scripts/indexing.py:145-281`), extracts the JSON member of a
  * `.tar.gz` archive (`scripts/indexing.py:174-207`), globs an import
  * directory (`document_service.py:423-475`), and accepts HTTP uploads
  * (`app/main.py:106-160`). All are declarative scans here — Spark's JSON
  * source is parallel and schema-inferring; plain `.gz` decompresses
  * transparently; `.tar.gz` goes through a `binaryFile` scan + per-archive
  * tar decode on the executors (S2 below).
  */
object JsonSource {

  /** S1: one JSON array file (`[{...}, ...]`) → DataFrame. */
  def readJsonArray(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)

  /** S3: directory of *.json files, parallel per-file. */
  def readJsonDir(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("multiLine", "true").json(s"$dir/*.json")

  /** S3b: directory of line-delimited JSON (one record per line) — the
    * bulk-pipeline sibling of [[readJsonDir]]'s array files, and the
    * format Spark's own streamed JSON export (S8) produces. Splittable
    * per LINE, not per file, so a 100 TB import parallelizes within
    * files too. */
  def readJsonLines(spark: SparkSession, dir: String): DataFrame =
    spark.read.json(dir)

  /** S2: `.tar.gz` archives whose payload is a JSON array member
    * (`scripts/indexing.py:174-207`): per archive, take the FIRST member
    * named `*.json` (the reference warns and uses the first on multiples)
    * and parse it. `binaryFile` scan → executor-side gzip+tar decode
    * (commons-compress, already on Spark's classpath) → JSON parse.
    * Parallelism is per-archive — the right unit, since tar members only
    * stream sequentially; a 100 TB import stages many archives, not one.
    * Archives with no JSON member yield no rows (a distributed import
    * skips bad files; the reference, single-file, raises). */
  def readTarGzJson(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    val archives = spark.read.format("binaryFile").load(pathGlob)
      .select(col("content")).as[Array[Byte]]
    val jsonDocs = archives.flatMap(firstJsonMember _)
    spark.read.json(jsonDocs)
  }

  /** First `*.json` tar member's text, or None. Runs on executors. */
  private def firstJsonMember(archive: Array[Byte]): Option[String] = {
    val tin = new org.apache.commons.compress.archivers.tar.TarArchiveInputStream(
      new org.apache.commons.compress.compressors.gzip.GzipCompressorInputStream(
        new java.io.ByteArrayInputStream(archive)))
    try {
      Iterator.continually(tin.getNextEntry)
        .takeWhile(_ != null)
        .collectFirst {
          case e if !e.isDirectory && e.getName.endsWith(".json") =>
            new String(tin.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        }
    } finally tin.close()
  }

  /** §1.2 derived text columns (`scripts/indexing.py:225-241`):
    * dense_text = description only; sparse_text = description ⊕ partNumber
    * ⊕ mfrPartNumber (null-skipping concat, F1); searchable_text alias;
    * missing critical fields backfilled with null (P8). */
  def deriveTextColumns(df: DataFrame, descCol: String, partNoCol: String,
                        mfrPartNoCol: String): DataFrame = {
    val withCols = Seq(descCol, partNoCol, mfrPartNoCol)
      .foldLeft(df) { (d, c) =>
        if (d.columns.contains(c)) d else d.withColumn(c, lit(null).cast("string"))
      }
    withCols
      .withColumn("dense_text", col(descCol).cast("string"))
      .withColumn("sparse_text",
        concat_ws(" ", col(descCol).cast("string"), col(partNoCol), col(mfrPartNoCol)))
      .withColumn("searchable_text", col("sparse_text"))
  }

  /** S4 upload path id assignment (`app/main.py:137`): stable id from the
    * part-number key — md5-derived, not Python's salted hash. */
  def withStableId(df: DataFrame, keyCol: String): DataFrame =
    df.withColumn("id", HashOps.stableId(col(keyCol)))
}
