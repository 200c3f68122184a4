package graft

import graft.search.Bm25

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  test("okapi bm25 matches a hand-computed score") {
    // corpus: 3 docs; query term "apple" appears in doc 1 (x2 of 4 tokens)
    // and doc 2 (x1 of 2 tokens). N=3, df=2, avgdl=(4+2+3)/3=3.
    val docs = Seq(
      (1L, "apple pie apple tart"),
      (2L, "apple juice"),
      (3L, "banana kiwi melon")).toDF("doc_id", "text")
    val out = Bm25.score(docs, "doc_id", "text", Seq("apple"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    def w(tf: Int, dl: Int): Double =
      idf * tf * (Bm25.K1 + 1) / (tf + Bm25.K1 * (1 - Bm25.B + Bm25.B * dl / 3.0))
    def r6(x: Double): Double = math.rint(x * 1e6) / 1e6

    assert(out.keySet == Set(1L, 2L))
    assert(math.abs(out(1L) - r6(w(2, 4))) < 1e-9)
    assert(math.abs(out(2L) - r6(w(1, 2))) < 1e-9)
    // doc 1 has higher tf but longer doc; with these numbers tf wins
    assert(out(1L) > out(2L))
  }

  test("multi-term scores are per-term sums; absent terms contribute nothing") {
    val docs = Seq(
      (1L, "a b c"),
      (2L, "a a d")).toDF("doc_id", "text")
    val single = Bm25.score(docs, "doc_id", "text", Seq("b"))
      .collect().map(r => r.getLong(0)).toSet
    assert(single == Set(1L))
    val multi = Bm25.score(docs, "doc_id", "text", Seq("a", "b", "zzz"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(multi.keySet == Set(1L, 2L))
  }
}
