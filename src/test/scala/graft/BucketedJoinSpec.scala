package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.Model
import graft.index.MlIndex
import graft.ingest.Store
import graft.tables.Tables

class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    val base = Files.createTempDirectory("graft-bucket").toString
    val docs = Tables.documents(spark, Sf0001)
    val emb = Tables.embeddings(spark, Sf0001)
      .withColumnRenamed("vec_id", "doc_id")
    Store.writeBucketed(docs, "b_docs", s"$base/docs", "doc_id", 4)
    Store.writeBucketed(emb, "b_emb", s"$base/emb", "doc_id", 4)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_docs").join(spark.table("b_emb"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 500)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_docs")
      spark.sql("DROP TABLE IF EXISTS b_emb")
    }
  }

  test("kmeans ivf centroids train deterministically and cover the data") {
    val docs = Tables.documents(spark, Sf0001).limit(200)
    val model = MlIndex.fitEmbedder(docs, "text", 32)
    val embedded = model.transform(docs)
    val km = MlIndex.fitIvfCentroids(embedded, k = 5)
    assert(km.clusterCenters.length == 5)
    val assigned = km.transform(embedded)
    assert(assigned.select("prediction").distinct().count() <= 5)
    // fixed seed -> identical centers on refit
    val km2 = MlIndex.fitIvfCentroids(embedded, k = 5)
    assert(km.clusterCenters.map(_.toArray.toSeq).toSeq ==
      km2.clusterCenters.map(_.toArray.toSeq).toSeq)
  }

  test("typed Dataset core model round-trips") {
    val docs = Model.documents(spark, Sf0001)
    assert(docs.head().doc_id >= 0)
    assert(docs.filter(_.lang == "en").count() > 0) // typed lambda filter
    val hits = Model.asHits(
      graft.search.SearchEngine.denseTopK(spark, Sf0001, 0, 5))
    val top = hits.take(5)
    assert(top.length == 5 && top.head.score >= top.last.score)
  }
}
