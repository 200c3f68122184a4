package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ColumnBridge, CosineSimilarity, DotProduct}

/** Column-level vector functions (reference §2.9: V4 cosine, V5 dot).
  *
  * The codegen'd Catalyst expressions are the hot path; everything stays
  * inside whole-stage codegen (no UDF serialization boundary).
  */
object VectorOps {

  /** Cosine similarity in [-1, 1]; 0.0 for zero vectors (reference returns
    * a zero vector on embed failure, `app/services/search_service.py:134-136`,
    * which must score 0, not NaN). */
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a.cast("array<float>")),
      ColumnBridge.expression(b.cast("array<float>"))))

  /** Dense dot product (double accumulation). */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a.cast("array<float>")),
      ColumnBridge.expression(b.cast("array<float>"))))

  /** L2 norm of a float-array column. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine via built-in higher-order functions only — the reference
    * implementation used by tests to cross-check the codegen expression. */
  def cosineSimHof(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>"); val bd = b.cast("array<double>")
    val dotp = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na = aggregate(ad, lit(0.0), (acc, v) => acc + v * v)
    val nb = aggregate(bd, lit(0.0), (acc, v) => acc + v * v)
    when(na === 0.0 || nb === 0.0, lit(0.0))
      .otherwise(dotp / (sqrt(na) * sqrt(nb)))
  }
}
