package graft

import org.apache.spark.sql.functions._

import graft.index.MlIndex
import graft.tables.Tables

/** r15 optimization pin: [[MlIndex.approxNearDupSelf]] (the id-keyed
  * restructure that x2 serves through) must produce EXACTLY the pairs and
  * distances of MLlib's own `approxSimilarityJoin` — same model, same
  * hashes, same strict `< maxDistance` filter. */
class MlIndexFastJoinSpec extends SparkSpec {

  test("approxNearDupSelf ≡ MLlib approxSimilarityJoin (pairs and 6dp distances)") {
    val docs = Tables.documents(spark, Sf0001).orderBy(col("doc_id")).limit(120)
    val model = MlIndex.fitEmbedder(docs, "text", 64)
    val embedded = model.transform(docs).localCheckpoint()
    val ann = MlIndex.fitAnn(embedded, numHashTables = 8)

    val mllib = MlIndex.approxNearDup(ann, embedded, embedded, 1.0)
      .selectExpr("datasetA.doc_id AS id_a", "datasetB.doc_id AS id_b",
        "round(dist, 6) AS dist")
      .where(col("id_a") < col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val fast = MlIndex.approxNearDupSelf(ann, embedded, "doc_id", 1.0)
      .select(col("id_a"), col("id_b"), round(col("dist"), 6).as("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(fast.nonEmpty, "fixture must produce candidate pairs")
    assert(fast == mllib)
  }

  test("l2Dist ≡ interpreted sqrt(aggregate(zip_with)) fold (bitwise)") {
    val emb = Tables.embeddings(spark, Sf0001).where(col("vec_id") < 40)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val a = emb.select(col("vec_id").as("ia"), col("v").as("va"))
    val b = emb.select(col("vec_id").as("ib"), col("v").as("vb"))
    val both = a.crossJoin(b).where(col("ia") < col("ib"))
      .select(
        graft.functions.VectorOps.l2Dist(col("va"), col("vb")).as("fast"),
        sqrt(aggregate(zip_with(col("va"), col("vb"),
          (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }
}
