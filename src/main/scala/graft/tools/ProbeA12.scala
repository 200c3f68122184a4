package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.search.Ann
import graft.tables.Tables

/** Throwaway forensics main: decompose a12_batched_ann's cost into its
  * component jobs under the exact Bench regime (persisted base tables,
  * warm JIT). Not part of the library surface.
  */
object ProbeA12 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    Tables.names.foreach { n =>
      Tables(spark, d, n).persist(StorageLevel.MEMORY_AND_DISK).count()
    }
    val info = graft.index.IvfIndex.ensure(spark, d)

    def t(label: String)(f: => Unit): Unit = {
      f
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
      }
      println(f"PROBE $label ${runs.sorted.apply(1)}%.3f")
    }

    t("read_assigned") { spark.read.parquet(info.assignedPath).count() }
    t("a12_artifact") {
      val assigned = spark.read.parquet(info.assignedPath)
      val centroids = spark.read.parquet(info.centroidsPath)
      val queries = Tables.embeddings(spark, d).where(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Ann.ivfTopKBatched(assigned, centroids, queries, 3, 5).count()
    }
    t("a12_inline") {
      val emb = Tables.embeddings(spark, d)
      val centroids = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val queries = emb.where(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Ann.ivfTopKBatched(Ann.ivfAssign(emb, centroids), centroids, queries, 3, 5).count()
    }
    t("assign_inline") {
      val emb = Tables.embeddings(spark, d)
      val centroids = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      Ann.ivfAssign(emb, centroids).count()
    }
    t("probe_stage_only") {
      val centroids = spark.read.parquet(info.centroidsPath)
      val queries = Tables.embeddings(spark, d).where(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      queries.crossJoin(broadcast(centroids))
        .withColumn("qscore",
          round(graft.functions.VectorOps.cosineSim(col("cvec"), col("qvec")), 6))
        .count()
    }
    val assignedCached = spark.read.parquet(info.assignedPath)
      .persist(StorageLevel.MEMORY_AND_DISK)
    assignedCached.count()
    val centroidsCached = spark.read.parquet(info.centroidsPath)
      .persist(StorageLevel.MEMORY_AND_DISK)
    centroidsCached.count()
    t("a12_artifact_cached") {
      val assigned = spark.read.parquet(info.assignedPath)
      val centroids = spark.read.parquet(info.centroidsPath)
      val queries = Tables.embeddings(spark, d).where(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Ann.ivfTopKBatched(assigned, centroids, queries, 3, 5).count()
    }
    t("a11_artifact") {
      val emb = Tables.embeddings(spark, d)
      val assigned = spark.read.parquet(info.assignedPath)
      val centroids = spark.read.parquet(info.centroidsPath)
      val qv = emb.where(col("vec_id") === graft.Queries.QueryVecId)
        .select(col("embedding").as("qvec"))
      val cand = Ann.ivfTopKAssigned(assigned, centroids, qv, 3, 20).select(col("id"))
      val candVecs = emb.join(cand, emb("vec_id") === cand("id"))
        .select(col("vec_id"), col("embedding"))
      Ann.mmrRerank(candVecs, qv, m = 20, k = 10, lambda = 0.7)
        .orderBy(col("mmr_rank")).count()
    }
    spark.stop()
  }
}
