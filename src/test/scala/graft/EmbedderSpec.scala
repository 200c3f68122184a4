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

  test("frozen-idf embedding: docVectorsWithIdf over a parquet-roundtripped idf == in-plan docVectors") {
    val docs = Tables.documents(spark, Sf0001)
    val idfDir = java.nio.file.Files
      .createTempDirectory("graft-frozen-idf").toString
    TfIdfEmbedder.idf(docs, "doc_id", "text", 64)
      .coalesce(1).write.mode("overwrite").parquet(idfDir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("bucket"), round(col("w"), 9).as("w"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val frozen = rows(TfIdfEmbedder.docVectorsWithIdf(
      docs, "doc_id", "text", spark.read.parquet(idfDir)))
    val inPlan = rows(TfIdfEmbedder.docVectors(docs, "doc_id", "text"))
    assert(frozen == inPlan && frozen.nonEmpty)
  }

  test("embedDocsDense: frozen-space embed reproduces build vectors; all-OOV doc zero-fills (V6)") {
    import graft.index.TfIdfGraphIndex
    // tiny corpus dataDir: the frozen embedder's training set covers only
    // the buckets of these four tokens, so an unseen-bucket doc is
    // constructible (the sf corpora cover all 64 buckets)
    val dataDir = java.nio.file.Files
      .createTempDirectory("graft-frozen-corpus").toString
    Seq((0L, "alpha beta"), (1L, "alpha gamma"), (2L, "beta delta"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dataDir/documents.parquet")
    val corpusBuckets = (Seq("alpha", "beta", "gamma", "delta")
      .map(graft.index.TfIdfIndex.bucketOf(_))).toSet
    // find a token whose bucket the corpus never saw
    val oovTok = Iterator.from(0).map(i => s"zzz$i")
      .find(t => !corpusBuckets(graft.index.TfIdfIndex.bucketOf(t))).get
    val newDocs = Seq((10L, "alpha beta"), (11L, s"$oovTok $oovTok"))
      .toDF("doc_id", "text")
    val dense = TfIdfGraphIndex.embedDocsDense(spark, dataDir, newDocs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(dense.keySet == Set(10L, 11L))
    assert(dense(11L).forall(_ == 0.0f)) // all-OOV -> zero vector, not absent
    // the in-vocab doc lands on the same vector the BUILD gave doc 0
    // (same text, same frozen idf)
    val built = TfIdfGraphIndex.vectors(spark, dataDir)
      .where(col("vec_id") === 0L)
      .collect().head.getSeq[Float](1)
    assert(dense(10L) == built)
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
