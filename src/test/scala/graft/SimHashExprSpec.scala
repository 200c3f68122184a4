package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.{HashOps, TextOps}
import graft.tables.Tables

/** r15 optimization pin: the per-row codegen SimHash32 must be
  * bit-identical to the aggregate formulation it replaced — explode →
  * groupBy(id, tok) tf → 32 tf-weighted vote sums → reassemble —
  * including tf weighting (repeated tokens) and the md5-based token hash. */
class SimHashExprSpec extends SparkSpec {

  /** The pre-r15 aggregate formulation, verbatim. */
  private def simhashAgg(docs: org.apache.spark.sql.DataFrame,
                         idCol: String, textCol: String) = {
    val tf = docs
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("hv", HashOps.tokenHash32(col("tok")))
    val voteAggs = (0 until 32).map { bi =>
      sum(col("tf") *
        (shiftright(col("hv"), bi).bitwiseAND(lit(1L)) * 2 - 1)).as(s"v$bi")
    }
    val votes = tf.groupBy(col(idCol)).agg(voteAggs.head, voteAggs.tail: _*)
    val assembled = (0 until 32)
      .map(bi => when(col(s"v$bi") > 0, lit(1L << bi)).otherwise(lit(0L)))
      .reduce(_ + _)
    votes.select(col(idCol), assembled.as("simhash"))
  }

  test("SimHash32 ≡ aggregate formulation on the corpus (row set and bits)") {
    val docs = Tables.documents(spark, Sf0001)
    val fast = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val slow = simhashAgg(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fast.nonEmpty)
    assert(fast == slow)
  }

  test("tf weighting: repeated tokens vote with their multiplicity; empty docs absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark spark join"), // tf=3 must outvote tf=1
      (2L, "join spark"),
      (3L, ""),                       // no tokens -> no row (aggregate form had none)
      (4L, "   "),
      (5L, "unique")).toDF("doc_id", "text")
    val fast = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val slow = simhashAgg(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fast.keySet == Set(1L, 2L, 5L))
    assert(fast == slow)
  }

  test("WinnowFingerprints ≡ interpreted transform/slice formulation") {
    val k = 3; val w = 4
    val base = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("__toks"))
      .where(size(col("__toks")) >= k + w - 1)
    // the pre-r15 formulation, verbatim
    val slow = base
      .select(col("doc_id"), transform(
          sequence(lit(0), size(col("__toks")) - k),
          i => HashOps.tokenHash32(concat_ws(" ",
            (1 to k).map(j => element_at(col("__toks"), i + j)): _*)))
        .as("__hs"))
      .select(col("doc_id"), transform(
          sequence(lit(0), size(col("__hs")) - w),
          i => array_min(slice(col("__hs"), i + 1, lit(w))))
        .as("__mins"))
      .select(col("doc_id"), size(col("__mins")).cast("long").as("n_windows"),
        array_sort(array_distinct(col("__mins"))).as("__fps"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getSeq[Long](2)))).toMap
    val fast = base
      .select(col("doc_id"),
        (size(col("__toks")) - (k + w - 2)).cast("long").as("n_windows"),
        org.apache.spark.sql.graft.ColumnBridge.column(
          org.apache.spark.sql.graft.WinnowFingerprints(
            org.apache.spark.sql.graft.ColumnBridge.expression(col("__toks")),
            k, w)).as("__fps"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getSeq[Long](2)))).toMap
    assert(fast.nonEmpty)
    assert(fast == slow)
  }

  test("Shingles ≡ interpreted transform/array_distinct formulation (order included)") {
    val n = 3
    val base = Tables.documents(spark, Sf0001)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
    // the pre-r15 formulation, verbatim (let-bound via single-element array)
    val slow = base.select(col("doc_id"),
        element_at(transform(array(col("t")), t => {
          val grams = transform(
            sequence(lit(0), size(t) - n),
            i => concat_ws(" ", (1 to n).map(j => element_at(t, i + j)): _*))
          when(size(t) >= n, array_distinct(grams))
            .otherwise(array().cast("array<string>"))
        }), 1).as("sh"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    val fast = base.select(col("doc_id"), TextOps.shingles(col("t"), n).as("sh"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    assert(fast.nonEmpty)
    assert(fast == slow)
    // short-doc and empty-doc edges: empty array, not null
    import spark.implicits._
    val edge = Seq((1L, "a b"), (2L, "")).toDF("doc_id", "text")
      .select(col("doc_id"),
        TextOps.shingles(TextOps.tokens(col("text")), n).as("sh"))
      .collect().map(r => (r.getLong(0), r.isNullAt(1), r.getSeq[String](1)))
    edge.foreach { case (_, isNull, sh) => assert(!isNull && sh.isEmpty) }
  }

  test("token hash helper ≡ HashOps.tokenHash32 (md5 first-4-bytes contract)") {
    val toks = Seq("spark", "a", "", "étoile", "ÿx", "0123456789abcdef")
    toks.foreach { t =>
      val viaSql = spark.sql(
        s"SELECT conv(substring(md5('${t.replace("'", "''")}'), 1, 8), 16, 10)")
        .collect()(0).getString(0).toLong
      val viaHelper = org.apache.spark.sql.graft.SimHash32Helper.tokenHash32(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
      assert(viaHelper == viaSql, s"hash mismatch for '$t'")
    }
  }
}
