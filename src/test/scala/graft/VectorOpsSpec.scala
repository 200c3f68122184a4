package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.tables.Tables

class VectorOpsSpec extends SparkSpec {

  test("codegen cosine matches the higher-order-function reference impl") {
    val emb = Tables.embeddings(spark, Sf0001).limit(100)
    val q = Tables.embeddings(spark, Sf0001)
      .where(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val both = emb.crossJoin(broadcast(q)).select(
      VectorOps.cosineSim(col("embedding"), col("qvec")).as("expr"),
      VectorOps.cosineSimHof(col("embedding"), col("qvec")).as("hof"))
    val rows = both.collect()
    assert(rows.length == 100)
    rows.foreach { case Row(e: Double, h: Double) =>
      assert(math.abs(e - h) < 1e-12, s"expr=$e hof=$h")
    }
  }

  test("cosine of identical vectors is 1, orthogonal is 0, zero vector is 0") {
    import spark.implicits._
    val df = Seq(
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f), 1.0),
      (Array(1f, 0f), Array(0f, 1f), 0.0),
      (Array(0f, 0f), Array(1f, 2f), 0.0) // embed-failure fallback scores 0, not NaN
    ).toDF("a", "b", "want")
    df.select(VectorOps.cosineSim(col("a"), col("b")).as("got"), col("want"))
      .collect().foreach { case Row(got: Double, want: Double) =>
        assert(math.abs(got - want) < 1e-9)
      }
  }

  test("mismatched dimensions yield null, not a silent prefix score") {
    import spark.implicits._
    val df = Seq((Array(1f, 2f, 3f), Array(1f, 2f))).toDF("a", "b")
    val r = df.select(
      VectorOps.cosineSim(col("a"), col("b")).as("c"),
      VectorOps.dot(col("a"), col("b")).as("d")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("dot product and l2 norm") {
    import spark.implicits._
    val df = Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
    val r = df.select(
      VectorOps.dot(col("a"), col("b")).as("d"),
      VectorOps.l2Norm(col("a")).as("n")).head()
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(14.0)) < 1e-12)
  }
}
