package graft

import org.apache.spark.sql.functions._

import graft.index.{MlIndex, TfIdfEmbedder}
import graft.tables.Tables

class EmbedderSpec extends SparkSpec {
  import spark.implicits._

  test("tfidf doc vectors are l2-normalized in bucket space") {
    val docs = Tables.documents(spark, Sf0001).limit(50)
    val norms = TfIdfEmbedder.docVectors(docs, "doc_id", "text")
      .groupBy("doc_id").agg(sum(col("w") * col("w")).as("n2"))
      .collect().map(_.getDouble(1))
    assert(norms.length == 50)
    norms.foreach(n2 => assert(math.abs(n2 - 1.0) < 1e-9))
  }

  test("searchText: a doc containing exactly the query scores highest") {
    val docs = Seq(
      (1L, "spark join filter"),
      (2L, "spark join filter banana banana banana"),
      (3L, "completely unrelated words entirely")).toDF("doc_id", "text")
    val hits = TfIdfEmbedder.searchText(docs, "doc_id", "text", "spark join filter", 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(hits.head._1 == 1L)           // exact match ranks first
    assert(hits.head._2 > hits(1)._2)    // strictly above the diluted doc
    assert(!hits.map(_._1).contains(3L)) // no shared buckets -> no row
  }

  test("query embedding uses corpus idf (rare terms dominate)") {
    val docs = Seq(
      (1L, "common common rare"),
      (2L, "common common common"),
      (3L, "common other thing")).toDF("doc_id", "text")
    val hits = TfIdfEmbedder.searchText(docs, "doc_id", "text", "rare", 3)
      .collect().map(_.getLong(0))
    assert(hits.head == 1L)
  }

  test("mllib pipeline: fit/transform produce normalized vectors; lsh join finds the planted dup") {
    val docs = Tables.documents(spark, Sf0001).limit(100)
      .union(Tables.documents(spark, Sf0001).where(col("doc_id") === 1)
        .withColumn("doc_id", lit(9999L)))
    val model = MlIndex.fitEmbedder(docs, "text", 64)
    val embedded = model.transform(docs).cache()
    val v = embedded.select("features").head()
      .getAs[org.apache.spark.ml.linalg.Vector](0)
    assert(math.abs(math.sqrt(v.toArray.map(x => x * x).sum) - 1.0) < 1e-9)

    val ann = MlIndex.fitAnn(embedded)
    val pairs = MlIndex.approxNearDup(ann, embedded, embedded, 0.01)
      .select(col("datasetA.doc_id").as("a"), col("datasetB.doc_id").as("b"))
      .where(col("a") =!= col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 9999L))) // identical text -> distance 0
  }
}
