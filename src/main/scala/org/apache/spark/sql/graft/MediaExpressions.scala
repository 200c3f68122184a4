package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Static helper the generated code calls (same pattern as DeflateHelper). */
object NibbleHistogramHelper {
  /** Count hex-digit occurrences of `hex(bytes)` in ONE pass over the raw
    * bytes: hex char `c` appears once per nibble equal to `c`, so the
    * histogram of the hex string is exactly the nibble histogram. Counts
    * are exact ints, returned as float (the value
    * `cast(cast(count AS double) AS float)` produces for any count below
    * 2^24 — far above any payload this expression sees per row). */
  def count(bytes: Array[Byte]): ArrayData = {
    val c = new Array[Int](16)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      c(b >>> 4) += 1
      c(b & 0xF) += 1
      i += 1
    }
    val out = new Array[Float](16)
    i = 0
    while (i < 16) { out(i) = c(i).toDouble.toFloat; i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

/** Codegen'd nibble histogram over a BINARY column → ARRAY<FLOAT>[16].
  *
  * Replaces the 16×`(length(hex(p)) - length(translate(hex(p), c, '')))`
  * projection (which materializes the hex string and then copies it once
  * per bin — 17 full-payload string allocations per row) with a single
  * pass over the raw bytes. Values are identical: hex(payload) contains
  * one character per nibble, so per-hex-char counts ARE per-nibble counts.
  */
case class NibbleHistogram(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nibble_histogram"

  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    NibbleHistogramHelper.count(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = org.apache.spark.sql.graft.NibbleHistogramHelper.count($b);")

  override protected def withNewChildInternal(newChild: Expression): NibbleHistogram =
    copy(child = newChild)
}
