package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static helper the generated code calls — a top-level object compiles
  * with static forwarders, so codegen can reference
  * `org.apache.spark.sql.graft.DeflateHelper.ratio(...)` directly. */
object DeflateHelper {
  /** DEFLATE (zlib level 6, raw stream) compressed size over raw UTF-8
    * size. Empty input → 1.0 (defined as incompressible). The Deflater is
    * per-call: cheap relative to compressing document-sized payloads, and
    * keeps the expression thread-safe with no executor-side state. */
  def ratio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / bytes.length
    } finally d.end()
  }
}

/** Per-document DEFLATE compression ratio (compressed bytes / raw bytes)
  * over a string column — the classic low-information-content signal in
  * corpus quality filtering: boilerplate, repeated spans, and template
  * spam compress far below natural prose, so a low ratio flags machine-
  * generated or duplicated text and an unusually high one flags
  * random/encoded payloads. One of the training-data-pipeline extensions
  * beyond the reference's surface (its quality signals are payload
  * metadata fields, not content-derived).
  *
  * Stays inside whole-stage codegen via a static helper call (the codec
  * itself is JVM-library work either way; what matters is no Row
  * materialization and no UDF boxing around it). Deterministic for a
  * fixed zlib level, so results are stable across runs and partitionings.
  */
case class DeflateRatio(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "deflate_ratio"

  override protected def nullSafeEval(input: Any): Any =
    DeflateHelper.ratio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.DeflateHelper.ratio($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}
