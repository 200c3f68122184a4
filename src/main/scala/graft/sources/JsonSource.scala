package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.HashOps

/** JSON ingestion (reference §2.1 S1–S4): the reference loads a JSON array
  * file (`scripts/indexing.py:145-281`), globs an import directory
  * (`document_service.py:423-475`), and accepts HTTP uploads
  * (`app/main.py:106-160`). All of those are one declarative scan here —
  * Spark's JSON source is already parallel and schema-inferring; .gz is
  * decompressed transparently (the reference's tar.gz special case S2 is
  * handled by accepting .json/.json.gz members directly).
  */
object JsonSource {

  /** S1: one JSON array file (`[{...}, ...]`) → DataFrame. */
  def readJsonArray(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)

  /** S3: directory of *.json files, parallel per-file. */
  def readJsonDir(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("multiLine", "true").json(s"$dir/*.json")

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
