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

  test("moreLikeThis: anchor's top terms rank the rest, anchor excluded, " +
    "equals explicit-term BM25 on the candidate set") {
    val docs = Seq(
      (1L, "x x y z"),   // anchor: top-2 terms by (tf desc, term asc) = x, y
      (2L, "x y q"),     // matches both anchor terms
      (3L, "x q q"),     // matches x only
      (4L, "q r s")).toDF("doc_id", "text") // no overlap -> absent
    val out = Bm25.moreLikeThis(docs, "doc_id", "text", 1L, 2, 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(out.map(_._1).toSet == Set(2L, 3L), out.mkString(","))
    assert(!out.map(_._1).contains(1L), "anchor must not match itself")
    assert(out.head._1 == 2L, "two-term match outranks one-term match")
    // hand check doc 3: matches only 'x' (tf=1, dl=3); df(x)=2 over the
    // anchor-excluded candidate set, corpus stats over ALL 4 docs
    val idfX = math.log(1.0 + (4 - 2 + 0.5) / (2 + 0.5))
    val avgdl = (4 + 3 + 3 + 3) / 4.0
    val w3 = idfX * 1 * (Bm25.K1 + 1) /
      (1 + Bm25.K1 * (1 - Bm25.B + Bm25.B * 3 / avgdl))
    assert(math.abs(out.toMap.apply(3L) - math.rint(w3 * 1e6) / 1e6) < 1e-9)
  }
}
