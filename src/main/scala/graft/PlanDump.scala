package graft

import org.apache.spark.sql.SparkSession

import graft.search.SearchEngine

/** Dump the physical plans of the flagship queries (docs/PLANS.md source).
  * Usage: runMain graft.PlanDump <sfDir>   */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .appName("graft-plandump").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n===== $name =====")
      println(df.queryExecution.executedPlan.toString)
    }

    dump("dense_topk", SearchEngine.denseTopK(spark, dir, 0, 10))
    dump("bm25_topk_indexed", SearchEngine.bm25TopK(spark, dir, Seq("spark", "join", "filter"), 10))
    dump("bm25_direct", graft.search.Bm25.topK(
      graft.tables.Tables.documents(spark, dir), "doc_id", "text",
      Seq("spark", "join", "filter"), 10))
    dump("exact_match", SearchEngine.exactMatch(spark, dir, "src7", 10))
    dump("tfidf_search_indexed", SearchEngine.tfidfSearch(spark, dir, "spark join filter the data", 10))
    dump("minhash_lsh", graft.dedup.Dedup.minhashLsh(
      graft.tables.Tables.documents(spark, dir), "doc_id", "text", 3, 0.5))
    dump("simhash_pairs", graft.dedup.Dedup.simhashPairs(
      graft.tables.Tables.documents(spark, dir), "doc_id", "text", 3))
    dump("chunk_windows", graft.functions.TextOps.chunkWindows(
      graft.tables.Tables.documents(spark, dir), "doc_id", "text", 32, 24))
    dump("chunk_retrieval", {
      import org.apache.spark.sql.functions._
      val chunks = graft.functions.TextOps
        .chunkWindows(graft.tables.Tables.documents(spark, dir),
          "doc_id", "text", 32, 24)
        .select((col("doc_id") * 10000L + col("chunk_ord")).as("ck"),
          col("chunk_text"))
      graft.search.Bm25.topK(chunks, "ck", "chunk_text",
        Seq("stream", "window"), 10)
    })
    dump("batched_ann", {
      import org.apache.spark.sql.functions._
      val emb = graft.tables.Tables.embeddings(spark, dir)
      val centroids = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val queries = emb.where(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      graft.search.Ann.ivfTopKBatched(
        graft.search.Ann.ivfAssign(emb, centroids), centroids, queries, 3, 5)
    })
    dump("bloom_gate", {
      import org.apache.spark.sql.functions._
      val docs = graft.tables.Tables.documents(spark, dir)
      graft.functions.BloomGate.blocklistDrop(
        docs, col("text"),
        docs.where(col("source") === "src3").select(col("text")),
        col("text"), expectedItems = 1000L)
    })
    dump("interval_overlap", {
      import org.apache.spark.sql.functions._
      val iv = graft.tables.Tables.events(spark, dir)
        .groupBy(col("user_id")).agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"))
      graft.operators.RangeJoin.intervalOverlap(
        iv.select(col("user_id").as("user_a"), col("lo").as("lo_a"), col("hi").as("hi_a")),
        "lo_a", "hi_a",
        iv.select(col("user_id").as("user_b"), col("lo").as("lo_b"), col("hi").as("hi_b")),
        "lo_b", "hi_b", bucketWidth = 86400.0)
    })
    dump("zorder_scan", {
      import org.apache.spark.sql.functions._
      val out = graft.index.IndexCatalog.ensure(spark, dir, "zorder_v1") { p =>
        graft.ingest.Store.zorderLayout(
          graft.tables.Tables.documents(spark, dir), s"$p/docs",
          "n_chars", "doc_id", 16)
      }
      spark.read.parquet(s"$out/docs")
        .where(col("n_chars") >= 400 && col("n_chars") <= 600 &&
          col("doc_id") < 250)
        .select(col("doc_id"), col("n_chars"), col("lang"))
    })

    spark.stop()
  }
}
