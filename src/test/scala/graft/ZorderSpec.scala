package graft

import org.apache.spark.sql.functions._

import graft.ingest.Store
import graft.tables.Tables

/** Z-order layout: the answer never changes, and the clustering property
  * that makes row-group pruning work on BOTH dimensions actually holds on
  * the written files. */
class ZorderSpec extends SparkSpec {

  test("z-order layout preserves the table and clusters both dimensions") {
    val docs = Tables.documents(spark, Sf0001)
    val out = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    Store.zorderLayout(docs, s"$out/docs", "n_chars", "doc_id", numFiles = 16)
    val z = spark.read.parquet(s"$out/docs")

    // 1. lossless: same rows, same schema
    assert(z.count() == docs.count())
    assert(z.columns.sorted.toSeq == docs.columns.sorted.toSeq)
    assert(z.select("doc_id").except(docs.select("doc_id")).isEmpty)

    // 2. both-dimension clustering: per-file normalized (min,max) spans.
    //   A single-column sort gives ~1/numFiles span on the sort column but
    //   ~1.0 on the other; z-order trades to ~sqrt(1/numFiles) on BOTH.
    //   Assert the mean two-dimensional span beats the single-sort floor.
    val spans = z.groupBy(input_file_name().as("f"))
      .agg((max(col("n_chars")) - min(col("n_chars"))).cast("double").as("sa"),
        (max(col("doc_id")) - min(col("doc_id"))).cast("double").as("sb"))
    val g = docs.agg(
      (max(col("n_chars")) - min(col("n_chars"))).cast("double"),
      (max(col("doc_id")) - min(col("doc_id"))).cast("double"))
      .head()
    val (ga, gb) = (g.getDouble(0), g.getDouble(1))
    val rows = spans.collect()
    assert(rows.length > 4, s"expected multiple files, got ${rows.length}")
    val meanSpan = rows.map(r => (r.getDouble(1) / ga + r.getDouble(2) / gb) / 2)
      .sum / rows.length
    // single-sort floor: (1/16 + ~1)/2 ≈ 0.53; z-order lands well below
    assert(meanSpan < 0.45, f"mean normalized 2-dim span $meanSpan%.3f not clustered")

    // 3. predicates on both dimensions still reach the scan
    val plan = z.where(col("n_chars") >= 400 && col("doc_id") < 250)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("GreaterThanOrEqual(n_chars"),
      plan)
  }

  test("z-order handles a constant column (degenerate bounds) losslessly") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (42L, i)).toDF("a", "b")
    val out = java.nio.file.Files.createTempDirectory("graft-zconst").toString
    graft.ingest.Store.zorderLayout(df, s"$out/t", "a", "b", numFiles = 4)
    val back = spark.read.parquet(s"$out/t")
    assert(back.count() == 100)
    assert(back.agg(org.apache.spark.sql.functions.sum(col("b"))).head.getLong(0)
      == (1L to 100L).sum)
  }
}
