package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static helper the generated code calls (DeflateHelper pattern). */
object SimHash32Helper {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 4 MD5 bytes of the token's UTF-8 form as an unsigned 32-bit
    * value in a long — exactly `conv(substring(md5(tok), 1, 8), 16, 10)`
    * (the first 8 hex chars ARE the first 4 digest bytes). */
  def tokenHash32(t: UTF8String): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(t.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** 32-bit SimHash of a token array in ONE pass.
    *
    * Equality with the aggregate formulation (tf-weighted votes over
    * DISTINCT tokens): Σ_distinct tf(t)·(bit_b(h(t))·2−1) is the same
    * integer as Σ_instances (bit_b(h(tok))·2−1) — grouping identical
    * addends is associativity of integer addition, so folding per
    * instance needs no tf grouping (and no shuffle) at all. */
  def compute(toks: ArrayData): Long = {
    val votes = new Array[Long](32)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val hv = tokenHash32(toks.getUTF8String(i))
      var b = 0
      while (b < 32) {
        votes(b) += ((hv >>> b) & 1L) * 2 - 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }
}

/** Codegen'd 32-bit SimHash over an ARRAY<STRING> token column.
  *
  * Replaces the explode → groupBy(id, tok) → 32-vote-sum → groupBy(id)
  * pipeline (TWO corpus-token shuffles per call) with a per-row
  * expression: SimHash is a pure function of one document's token
  * multiset, and the tf weighting collapses into per-instance ±1 votes
  * (see [[SimHash32Helper.compute]]), all in exact integer arithmetic.
  * Callers filter empty token arrays to keep the aggregate
  * formulation's row set (a no-token doc produced no vote rows there). */
case class SimHash32(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash32"

  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    SimHash32Helper.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.SimHash32Helper.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

/** Static helper for [[WinnowFingerprints]]. */
object WinnowHelper {
  /** Sorted-distinct winnowed fingerprints of a token array in ONE pass:
    * k-gram MD5-32 hashes (the gram joined with single spaces — exactly
    * `tokenHash32(concat_ws(" ", toks[i..i+k-1]))`), then the min of each
    * w-hash window, deduped and sorted ascending. Caller guarantees
    * `toks.numElements >= k + w - 1`. */
  def compute(toks: ArrayData, k: Int, w: Int): ArrayData = {
    val n = toks.numElements()
    val m = n - k + 1
    val hs = new Array[Long](m)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks.getUTF8String(i + j).toString)
        j += 1
      }
      hs(i) = SimHash32Helper.tokenHash32(
        org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString))
      i += 1
    }
    val nw = m - w + 1
    val mins = new Array[Long](nw)
    i = 0
    while (i < nw) {
      var mn = hs(i)
      var j = 1
      while (j < w) { if (hs(i + j) < mn) mn = hs(i + j); j += 1 }
      mins(i) = mn
      i += 1
    }
    java.util.Arrays.sort(mins)
    var distinct = 0
    i = 0
    while (i < nw) {
      if (i == 0 || mins(i) != mins(i - 1)) { mins(distinct) = mins(i); distinct += 1 }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(mins, distinct))
  }
}

/** Codegen'd winnowing fingerprint set (Schleimer/Wilkerson/Aiken) over an
  * ARRAY<STRING> token column → sorted-distinct ARRAY<BIGINT>.
  *
  * Replaces the interpreted higher-order chain (`transform` building one
  * md5 per k-gram via concat_ws, then `array_min(slice(...))` per window —
  * a w-element array COPY per window, all outside whole-stage codegen)
  * with one pass per row. Values identical: same gram text, same MD5-32
  * hash, same window minima, same sort/distinct. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(k >= 1 && w >= 1, s"need k,w >= 1, got k=$k w=$w")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fingerprints"

  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    WinnowHelper.compute(input.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.WinnowHelper.compute($a, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** Static helper for [[Shingles]]. */
object ShinglesHelper {
  private val Space = UTF8String.fromString(" ")

  /** Distinct word n-grams in FIRST-OCCURRENCE order (array_distinct
    * semantics), each gram the n tokens joined with single spaces —
    * exactly `array_distinct(transform(..., concat_ws(" ", ...)))`.
    * Fewer than n tokens → empty array. */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    val total = toks.numElements() - n + 1
    if (total <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val gram = new Array[UTF8String](n)
    var i = 0
    while (i < total) {
      var j = 0
      while (j < n) { gram(j) = toks.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(Space, gram: _*))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      seen.toArray.asInstanceOf[Array[AnyRef]])
  }
}

/** Codegen'd distinct word n-gram shingles over an ARRAY<STRING> token
  * column → ARRAY<STRING> (first-occurrence order, n tokens joined by a
  * single space per gram).
  *
  * Replaces the interpreted `transform(sequence(...), i => concat_ws(...))`
  * + `array_distinct` chain — one interpreted lambda evaluation and one
  * N-way concat expression tree per gram — with a single pass per row.
  * Null-token-array inputs are handled by the caller (TextOps.shingles
  * coalesces to the empty array, the `when/otherwise` value of the old
  * form). */
case class Shingles(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(n >= 1, s"need n >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingles"

  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    ShinglesHelper.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.ShinglesHelper.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}
