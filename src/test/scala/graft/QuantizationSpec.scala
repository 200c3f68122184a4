package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.tables.Tables

class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  test("int8 quantization: codes bounded to [-127,127], scale recovers magnitude") {
    val df = Seq(Array(1.0f, -2.0f, 0.5f), Array(0.0f, 0.0f, 0.0f)).toDF("v")
    val rows = df.select(VectorOps.quantizeInt8(col("v")).as("qz"))
      .select(col("qz.scale"), col("qz.q")).collect()
    val (scale, q) = (rows(0).getDouble(0), rows(0).getSeq[Long](1))
    assert(q.forall(c => c >= -127 && c <= 127))
    assert(q(1) == -127) // max-|x| component saturates
    assert(math.abs(scale * q(0) - 1.0) < 0.02) // dequantized ~ original
    assert(rows(1).getSeq[Long](1).forall(_ == 0L)) // zero vector stays zero
  }

  test("quantized cosine tracks exact cosine within quantization error") {
    val emb = Tables.embeddings(spark, Sf0001).limit(200)
    val q = emb.where(col("vec_id") === 0)
      .select(VectorOps.quantizeInt8(col("embedding")).getField("q").as("qq"),
        col("embedding").as("qvec"))
    val both = emb.crossJoin(broadcast(q)).select(
      VectorOps.cosineSim(col("embedding"), col("qvec")).as("exact"),
      VectorOps.cosineSimInt8(
        VectorOps.quantizeInt8(col("embedding")).getField("q"), col("qq")).as("quant"))
    val errs = both.collect().map(r => math.abs(r.getDouble(0) - r.getDouble(1)))
    assert(errs.max < 0.02, s"max quantization error ${errs.max}")
  }

  test("quantized top-10 overlaps exact top-10 heavily (recall)") {
    val exact = graft.search.SearchEngine.denseTopK(spark, Sf0001, 0, 10)
      .collect().map(_.getLong(0)).toSet
    val quant = graft.QueriesPipeline.quantized("a2_quantized_topk")
      .fn(spark, Sf0001).collect().map(_.getLong(0)).toSet
    assert((exact & quant).size >= 8, s"recall too low: ${(exact & quant).size}/10")
  }
}
