package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{CosineSimilarity, DotProduct}

/** SparkSessionExtensions entry point: makes the engine's Catalyst
  * expressions first-class SQL functions.
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   SELECT id FROM products ORDER BY cosine_sim(dense_vec, :q) DESC LIMIT 10
  *
  * This is the (c) tier of the custom-operator preference order (see the
  * build brief): a native `Expression` registered through the public
  * extension mechanism — no UDF boxing, full codegen, usable from both the
  * Column API (graft.functions.VectorOps) and raw SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.registrations.foreach(ext.injectFunction)
    // O4c: serve ORDER BY cosine_sim(...) DESC LIMIT k from the persisted
    // IVF index on opt-in scans (see graft.plans.IvfAnnRewrite).
    ext.injectOptimizerRule(session => new graft.plans.IvfAnnRewrite(session))
  }
}

object GraftFunctions {
  type Registration =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val registrations: Seq[Registration] = Seq(
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (c: Seq[Expression]) => CosineSimilarity(c(0), c(1))),
    (FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (c: Seq[Expression]) => DotProduct(c(0), c(1))))

  /** Register on an already-built session (idempotent) — for environments
    * where the session exists before the library loads. */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
