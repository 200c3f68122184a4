package graft

import graft.dedup.Dedup
import graft.functions.CorpusStats

/** Hand-computed fixtures for the corpus-curation operators: repetition
  * quality filters, unigram-LM surprisal, passage-level chunk dedup.
  * Oracle parity at sf scale is covered by t12/t13/d10 driver rows. */
class CorpusStatsSpec extends SparkSpec {

  private def docsOf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("repetitionMetrics: fractions and keep verdict match hand computation") {
    val docs = docsOf(
      1L -> "a a a b", // maxc 3/4, dup 3/4, bigrams: "a a"x2 "a b"x1 -> 2/3
      2L -> (1 to 25).map(i => s"t$i").mkString(" ")) // all unique
    val m = CorpusStats.repetitionMetrics(docs)
      .collect().map(r => r.getLong(0) -> r).toMap

    val d1 = m(1L)
    assert(d1.getLong(1) == 4 && d1.getLong(2) == 2) // n_tokens, distinct
    assert(d1.getDouble(3) == 0.75) // top_token_frac
    assert(d1.getDouble(4) == 0.75) // dup_token_frac
    assert(d1.getDouble(5) == 0.666667) // top_bigram_frac
    assert(!d1.getBoolean(6))

    val d2 = m(2L)
    assert(d2.getDouble(3) == 0.04) // 1/25
    assert(d2.getDouble(4) == 0.0)
    assert(d2.getDouble(5) == 0.041667) // 1/24
    assert(d2.getBoolean(6), "all-unique doc must pass the filter")
  }

  test("unigramSurprisal: uniform corpus scores ln(1/p) exactly") {
    // corpus: a x2, b x2 -> p = 0.5 for both; every doc scores -ln(0.5)
    val docs = docsOf(1L -> "a a b", 2L -> "b")
    val rows = CorpusStats.unigramSurprisal(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows == Set((1L, 3L, 0.693147), (2L, 1L, 0.693147)), rows)
  }

  test("bigramSurprisal: interpolated probs match hand computation; short docs absent") {
    // corpus: doc1 = a b a b, doc2 = a b, doc3 = solo (no bigrams).
    // unigrams: a:3 b:3 solo:1, T=7; bigrams: (a,b):3 (b,a):1; left counts a:3 b:1.
    // P(b|a) = .7*(3/3) + .3*(3/7); P(a|b) = .7*(1/1) + .3*(3/7) — equal.
    val docs = docsOf(1L -> "a b a b", 2L -> "a b", 3L -> "solo")
    val p = 0.7 + (1.0 - 0.7) * (3.0 / 7.0)
    val lp = BigDecimal(math.log(p)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val want = (-lp).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = CorpusStats.bigramSurprisal(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows == Set((1L, 3L, want), (2L, 1L, want)), rows)
  }

  test("nbLangClassifier: separable vocab predicts held-out docs; ties break to smallest class") {
    import spark.implicits._
    // train (even ids): en={hello world}, fr={bonjour monde};
    // test (odd ids): evidence tokens decide; doc5's unseen-only token
    // gives equal class evidence -> prior tie -> 'en' < 'fr' wins.
    val docs = Seq(
      (0L, "hello world hello", "en"),
      (2L, "bonjour monde bonjour", "fr"),
      (1L, "hello hello", "en"),
      (3L, "bonjour", "fr"),
      (5L, "zzz", "en")).toDF("doc_id", "text", "lang")
    val out = CorpusStats.nbLangClassifier(docs)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(3)))).toMap
    assert(out(1L) == (("en", true)), out)
    assert(out(3L) == (("fr", true)), out)
    assert(out(5L)._1 == "en", s"prior+default tie must break to 'en': $out")
  }

  test("rocAuc: perfect separation = 1, all-tied = 0.5, mixed hand value") {
    import spark.implicits._
    def auc(rows: (Double, Boolean)*): (Double, Long, Long) = {
      val r = CorpusStats.rocAuc(rows.toDF("score", "pos"), "score", "pos").head()
      (r.getDouble(0), r.getLong(1), r.getLong(2))
    }
    assert(auc(0.9 -> true, 0.8 -> true, 0.7 -> false, 0.6 -> false) == ((1.0, 2L, 2L)))
    assert(auc(0.5 -> true, 0.5 -> false) == ((0.5, 1L, 1L)))
    // pos {0.9, 0.5}, neg {0.5, 0.1}: 1*(1+0.5) + 1*2 = 3.5 over 4
    assert(auc(0.9 -> true, 0.5 -> true, 0.5 -> false, 0.1 -> false) == ((0.875, 2L, 2L)))
  }

  test("curationVerdict: first failing rule wins, slack thresholds keep all") {
    val docs = docsOf(1L -> "a a a b", 2L -> "the quick brown fox jumps")

    def reasons(minQ: Double, maxRep: Double, maxSurp: Double) =
      CorpusStats.curationVerdict(docs, minQ, maxRep, maxSurp)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[String]("reason"), r.getAs[Boolean]("keep"))).toMap

    // quality rule fires first even when the doc is also repetitive
    val lowQ = reasons(minQ = 2.0, maxRep = 0.0, maxSurp = -1.0)
    assert(lowQ.values.forall(_ == (("low_quality", false))), lowQ)
    // next in line: repetition
    val rep = reasons(minQ = 0.0, maxRep = 0.0, maxSurp = -1.0)
    assert(rep.values.forall(_ == (("repetitive", false))), rep)
    // then surprisal
    val surp = reasons(minQ = 0.0, maxRep = 1.1, maxSurp = -1.0)
    assert(surp.values.forall(_ == (("surprising", false))), surp)
    // all slack -> keep
    val ok = reasons(minQ = 0.0, maxRep = 1.1, maxSurp = 1e9)
    assert(ok.values.forall(_ == (("ok", true))), ok)
  }

  test("chunkDedup: first occurrence wins, docs reassemble from survivors") {
    val docs = docsOf(1L -> "w x y z", 2L -> "w x q")
    val out = Dedup.chunkDedup(docs, chunkSize = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((2L, 2L, "w x y z")))
    assert(out(2L) == ((2L, 1L, "q")), "doc 2's 'w x' chunk is a duplicate of doc 1's")
  }

  test("chunkDedup: within-doc repeats also collapse to the first chunk") {
    val docs = docsOf(5L -> "p q p q p q")
    val out = Dedup.chunkDedup(docs, chunkSize = 2).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(1), r.getLong(2), r.getString(3)) == ((3L, 1L, "p q")))
  }

  test("chunkDedup: empty docs stay absent; a doc can lose every chunk") {
    val docs = docsOf(1L -> "w x", 2L -> "w x", 3L -> "  ")
    val out = Dedup.chunkDedup(docs, chunkSize = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out.keySet == Set(1L, 2L), "zero-token doc must not appear")
    assert(out(1L) == ((1L, 1L, "w x")))
    assert(out(2L) == ((1L, 0L, "")), "doc 2 loses its only chunk to doc 1")
  }

  test("vocabOovRates: top-V vocab with deterministic tie-break, occurrence-share OOV") {
    // counts: a=3, b=2, c=2, d=1, e=1 -> V=3 vocab {a, b, c} (c beats d
    // on count; b beats c only lexically — the tie-break under test)
    val docs = docsOf(1L -> "a a b c d", 2L -> "a b c e", 3L -> "")
    val out = CorpusStats.vocabOovRates(docs, vocabSize = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.keySet == Set(1L, 2L), "zero-token doc must not appear")
    assert(out(1L) == ((5L, 0.2))) // only "d" of 5 occurrences is OOV
    assert(out(2L) == ((4L, 0.25))) // only "e" of 4
    // shrinking the vocab flips c's occurrences to OOV in both docs
    val v2 = CorpusStats.vocabOovRates(docs, vocabSize = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(v2(1L) == 0.4 && v2(2L) == 0.5)
  }

  test("dsirWeights: target==corpus scores exactly zero; target-like docs rank higher") {
    import org.apache.spark.sql.functions._
    val docs = docsOf(
      1L -> "alpha beta alpha gamma",
      2L -> "alpha beta delta",
      3L -> "omega psi chi omega")
    // p_target == p_raw when every doc is the target -> every LLR is
    // ln(1) = 0 and every score is exactly 0.0
    val zero = CorpusStats.dsirWeights(docs, lit(true))
      .collect().map(r => r.getDouble(2))
    assert(zero.forall(_ == 0.0), zero.toList.toString)
    // target = docs 1,2 -> their shared alpha/beta vocab carries positive
    // LLR, doc 3's omega/psi/chi vocab negative
    val w = CorpusStats.dsirWeights(docs, col("doc_id") < 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(1L) > 0 && w(2L) > 0 && w(3L) < 0, w.toString)
    assert(w(3L) < w(1L) && w(3L) < w(2L))
  }

  test("retrieval eval: hand-traced recall/MRR/nDCG, zero-relevant query degenerates to zeros") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // q0 = (1,0) label 0; relevant corpus twins: v1 (high sim), v3 (sim 0)
    // v2 carries the wrong label; v4 is a singleton label (n_rel = 0)
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.9f, 0.1f), 0),
      (2L, Array(0.8f, 0.6f), 1),
      (3L, Array(0.0f, 1.0f), 0),
      (4L, Array(0.5f, 0.5f), 9)
    ).toDF("vec_id", "embedding", "label")
    val queries = emb.where(col("vec_id").isin(0L, 4L))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("label").as("qlabel"))
    val out = graft.functions.RetrievalEval.labelEval(emb, queries, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4))).toList
    // q0 top-2 = [v1 rel, v2 not]: recall 1/2, MRR 1/1,
    // nDCG = (1/log2(2)) / (1/log2(2) + 1/log2(3)) = 0.613147
    // q4: no corpus vector shares label 9 -> all metrics zero
    assert(out == List(
      (0L, 2L, 0.5, 1.0, 0.613147),
      (4L, 0L, 0.0, 0.0, 0.0)), out.toString)
  }

  test("pmi collocations: hand-traced bigram scores, min-count floor filters, empty docs safe") {
    val docs = docsOf(1L -> "x y x y x y x y", 2L -> "")
    // tokens: x*4 y*4 (Nt=8); bigrams: "x y"*4, "y x"*3 (Nb=7)
    val out = CorpusStats.pmiCollocations(docs, minCount = 1, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toList
    def pmi(cab: Double) = BigDecimal(math.log((cab / 7.0) / (0.5 * 0.5)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == List(("x", "y", 4L, pmi(4)), ("y", "x", 3L, pmi(3))), out.toString)
    // floor drops the rarer pair
    val floored = CorpusStats.pmiCollocations(docs, minCount = 4, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toList
    assert(floored == List(("x", "y")))
  }

  test("weighted sample: pure function of (id, weight); heavier weights dominate inclusion") {
    import spark.implicits._
    // 200 light rows (w=1) + 5 heavy rows (w=10000): A-ES must pick all
    // heavy rows into a top-10 sample with overwhelming weight ratio
    val rows = ((0L until 200L).map(i => (i, 1L)) ++
      (1000L until 1005L).map(i => (i, 10000L))).toDF("doc_id", "w")
    val picked = graft.functions.Sampling.weightedSample(rows, "doc_id", "w", 10)
      .collect().map(_.getLong(0)).toSet
    assert((1000L until 1005L).forall(picked), picked.toString)
    // determinism: same input -> identical sample, any partitioning
    val again = graft.functions.Sampling.weightedSample(
      rows.repartition(7), "doc_id", "w", 10).collect().map(_.getLong(0)).toSet
    assert(again == picked)
    intercept[IllegalArgumentException] {
      graft.functions.Sampling.weightedSample(rows, "doc_id", "w", 0)
    }
    // non-positive weights fail LOUDLY (NaN/Infinity keys would otherwise
    // sort above every real key and silently dominate the sample)
    val bad = ((0L until 5L).map(i => (i, 1L)) :+ (99L, 0L)).toDF("doc_id", "w")
    val e = intercept[Exception] {
      graft.functions.Sampling.weightedSample(bad, "doc_id", "w", 3).collect()
    }
    assert(e.getMessage.contains("non-positive weight") ||
      Option(e.getCause).exists(_.getMessage.contains("non-positive weight")),
      e.getMessage)
  }

  test("mattr: short docs fall back to TTR, windowed average matches hand trace") {
    // doc1: 4 tokens (< window) -> plain TTR 3/4.
    // doc2: 6 tokens, window 4 -> windows [a b a b] [b a b a] [a b a c]:
    //   distinct 2, 2, 3 -> (2+2+3) / (3*4) = 0.583333
    val docs = docsOf(1L -> "x y z x", 2L -> "a b a b a c")
    val m = CorpusStats.mattr(docs, window = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(m(1L) == ((4L, 0.75)), m.toString)
    assert(m(2L) == ((6L, 0.583333)), m.toString)
    // repetitive text scores strictly below diverse text of the same length
    val rep = docsOf(1L -> Seq.fill(30)("w").mkString(" "),
      2L -> (1 to 30).map(i => s"u$i").mkString(" "))
    val s = CorpusStats.mattr(rep, window = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(1L) == 0.1 && s(2L) == 1.0, s.toString)
  }

  test("vocabPrune: hapax and near-universal tokens dropped, counts reconcile") {
    // 4 docs; 'the' in all 4 (df=4 > 0.5*4) dropped; 'rare' df=1 dropped;
    // 'kept' df=2 retained.
    val docs = docsOf(
      1L -> "the kept rare", 2L -> "the kept", 3L -> "the", 4L -> "the")
    val out = CorpusStats.vocabPrune(docs, maxDfFrac = 0.5)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    assert(out(1L) == ((3L, 1L, 2L, 0.333333)), out.toString)
    assert(out(2L) == ((2L, 1L, 1L, 0.5)), out.toString)
    assert(out(3L) == ((1L, 0L, 1L, 0.0)), out.toString)
    out.values.foreach { case (n, k, dr, _) => assert(k + dr == n) }
  }

  test("curriculumBuckets: buckets partition the corpus, weights normalize, " +
    "temperature flattens toward uniform") {
    // 8 docs with clearly separated surprisal tiers via repetition level
    val docs = docsOf((1L to 8L).map { i =>
      val reps = i.toInt // doc i repeats its own token pair i times
      i -> (1 to reps).flatMap(_ => Seq(s"w$i", s"v$i")).mkString(" ")
    }: _*)
    val out = CorpusStats.curriculumBuckets(docs, nBuckets = 4, temperature = 2.0)
      .collect()
    assert(out.map(_.getInt(0)).toList == List(1, 2, 3, 4), "buckets 1..4 present")
    assert(out.map(_.getLong(1)).sum == 8L, "every doc lands in exactly one bucket")
    val wsum = out.map(_.getDouble(5)).sum
    assert(math.abs(wsum - 1.0) < 1e-4, s"weights sum to 1, got $wsum")
    // temperature flattening: max weight under T=2 is <= max raw share + eps
    val masses = out.map(_.getLong(2).toDouble)
    val rawMax = masses.max / masses.sum
    assert(out.map(_.getDouble(5)).max <= rawMax + 1e-6,
      "T>1 cannot sharpen the distribution")
    intercept[IllegalArgumentException] {
      CorpusStats.curriculumBuckets(docs, nBuckets = 1)
    }
  }
}
