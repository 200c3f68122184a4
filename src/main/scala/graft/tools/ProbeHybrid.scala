package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.search.SearchEngine
import graft.tables.Tables

/** Throwaway forensics main: same-JVM comparison of the exact batched
  * hybrid vs the IVF-dense-arm variant, plus each arm in isolation, under
  * the Bench regime (persisted base tables, warm JIT). Not part of the
  * library surface.
  */
object ProbeHybrid {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Tables.names.foreach { n =>
      Tables(spark, d, n).persist(StorageLevel.MEMORY_AND_DISK).count()
    }
    val bn = 64
    val idx = graft.index.Bm25Index.ensure(spark, d)
    val termPairs = spark.read.parquet(s"$idx/termstats")
      .orderBy(col("df").desc, col("term").asc).limit(2 * bn)
      .collect().map(_.getString(0)).grouped(2).toSeq
    val queries = termPairs.zipWithIndex.map { case (ts, i) =>
      (i.toLong, i.toLong, ts.toSeq)
    }
    val (assignedPath, centroidsPath) =
      graft.index.IvfIndex.ensureTrained(spark, d, k = 16)

    def t(label: String)(f: => Unit): Unit = {
      f
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
      }
      println(f"PROBE $label ${runs.sorted.apply(1)}%.3f")
    }

    t("hybrid_exact") {
      SearchEngine.hybridBatched(spark, d, queries, 10).count()
    }
    t("hybrid_ivf") {
      SearchEngine.hybridBatchedIvf(spark, d, queries, 10).count()
    }
    t("dense_arm_exact") {
      SearchEngine.denseTopKBatched(spark, d, queries.map(q => (q._1, q._2)), 20).count()
    }
    t("dense_arm_ivf") {
      val assigned = spark.read.parquet(assignedPath)
      val centroids = spark.read.parquet(centroidsPath)
      val qmap = spark.createDataFrame(queries.map(q => (q._1, q._2)))
        .toDF("qid", "qvec_id")
      val qdf = Tables.embeddings(spark, d)
        .join(broadcast(qmap), col("vec_id") === col("qvec_id"))
        .select(col("qid"), col("embedding").as("qvec"))
      graft.search.Ann.ivfTopKBatched(assigned, centroids, qdf, 4, 20).count()
    }
    t("sparse_arm") {
      val termsDf = spark.createDataFrame(
        queries.flatMap { case (qid, _, ts) => ts.distinct.map(t => (qid, t)) })
        .toDF("qid", "term")
      graft.index.Bm25Index.topKBatched(spark, idx, "doc_id",
        termsDf, "qid", "term", 20).count()
    }
    val plan = SearchEngine.hybridBatchedIvf(spark, d, queries, 10)
      .queryExecution.executedPlan.toString
    val nodes = plan.linesIterator.map(_.trim.dropWhile(c => !c.isLetter))
      .map(_.takeWhile(c => c.isLetterOrDigit)).toSeq
    println("PLANNODES " + nodes.groupBy(identity).view.mapValues(_.size).toSeq
      .filter(kv => Seq("Exchange", "Sort", "Window", "WindowGroupLimit",
        "SortMergeJoin", "BroadcastHashJoin", "CartesianProduct").contains(kv._1))
      .sortBy(_._1).mkString(", "))
    spark.stop()
  }
}
