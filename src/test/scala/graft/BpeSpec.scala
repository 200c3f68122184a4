package graft

import org.apache.spark.sql.functions._

import graft.functions.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // hand-traced Sennrich run: words {ab ×3, abc ×1}
  //   pairs (a,b):4 (b,</w>):3 (b,c):1 (c,</w>):1  -> merge 1 = (a,b)
  //   then (ab,</w>):3 beats the 1s                -> merge 2 = (ab,</w>)
  //   then the count-1 tie breaks lsym-asc         -> merge 3 = (ab,c)
  //   then                                         -> merge 4 = (abc,</w>)
  //   vocabulary exhausted -> early stop below nMerges
  private val docs = Seq((1L, "ab ab ab"), (2L, "abc")).toDF("doc_id", "text")

  test("bpeMerges reproduces the hand-traced merge table and stops early") {
    val got = Bpe.bpeMerges(docs, "text", 6)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (1L, "a", "b", "ab", 4L),
      (2L, "ab", "</w>", "ab</w>", 3L),
      (3L, "ab", "c", "abc", 1L),
      (4L, "abc", "</w>", "abc</w>", 1L)), got.toString)
  }

  test("encodeWord applies the learned table; unseen symbols pass through") {
    val merges = Bpe.bpeMerges(docs, "text", 6)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val out = Seq("abc", "ab", "low").toDF("w")
      .select(col("w"), Bpe.encodeWord(col("w"), merges).as("syms"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(out("abc") == List("abc</w>"), out.toString)
    assert(out("ab") == List("ab</w>"), out.toString)
    // no merge touches l/o/w: stays at character granularity
    assert(out("low") == List("l", "o", "w", "</w>"), out.toString)
  }

  test("adjacent self-pairs merge left-to-right non-overlapping") {
    // "aaa": pairs (a,a):2 within one word -> merge (a,a); the replace
    // must take ONE pass left-to-right: [a,a,a,</w>] -> [aa,a,</w>]
    val d = Seq((1L, "aaa")).toDF("doc_id", "text")
    val m1 = Bpe.bpeMerges(d, "text", 1)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
    assert(m1 == Seq(("a", "a", 2L)), m1.toString)
    val enc = Seq("aaa").toDF("w")
      .select(Bpe.encodeWord(col("w"), Seq(("a", "a"))).as("syms"))
      .collect().head.getSeq[String](0).toList
    assert(enc == List("aa", "a", "</w>"), enc.toString)
  }
}
