package graft

import org.apache.spark.sql.functions._

import graft.search.{Fusion, SearchEngine}

class FusionSpec extends SparkSpec {
  import spark.implicits._

  private def arm(rows: (Long, Double)*) =
    rows.toDF("id", "score")

  test("rrf: scores are sums of 1/(k+rank); full outer keeps one-sided hits") {
    val dense = arm(1L -> 0.9, 2L -> 0.8, 3L -> 0.7)
    val sparse = arm(2L -> 5.0, 4L -> 4.0)
    val out = Fusion.rrf(dense, sparse, "id", k = 60, limit = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 2: rank 2 dense, rank 1 sparse
    assert(math.abs(out(2L) - math.rint((1.0 / 62 + 1.0 / 61) * 1e6) / 1e6) < 1e-9)
    // doc 1: dense rank 1 only
    assert(math.abs(out(1L) - math.rint(1.0 / 61 * 1e6) / 1e6) < 1e-9)
    assert(out.contains(4L)) // sparse-only survives the full outer join
    // doc 2 (two arms) must outrank doc 1 (one arm, better rank)
    assert(out(2L) > out(1L))
  }

  test("simple fusion: keep-best score and sorted provenance concat") {
    val exact = Seq((1L, 1.0, "exact"), (5L, 0.9, "exact_secondary"))
      .toDF("id", "score", "search_type")
    val vector = Seq((1L, 0.6, "vector"), (7L, 0.5, "vector"))
      .toDF("id", "score", "search_type")
    val out = Fusion.simple(Seq(exact, vector), "id", 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(out.head == ((1L, 1.0, "exact+vector"))) // max score wins, provenance concat
    assert(out.map(_._1).toSeq == Seq(1L, 5L, 7L))  // score desc, id asc
  }

  test("min-max norm: constant arm maps to 1.0 (reference degenerate case)") {
    val const = arm(1L -> 0.5, 2L -> 0.5)
    val out = Fusion.minMaxNorm(const, "id").select("score")
      .collect().map(_.getDouble(0))
    assert(out.forall(_ == 1.0))
  }

  test("z-norm: zero stddev maps to 0.5 (reference degenerate case)") {
    val const = arm(1L -> 3.0, 2L -> 3.0)
    val out = Fusion.zNorm(const, "id").select("score")
      .collect().map(_.getDouble(0))
    assert(out.forall(_ == 0.5))
  }

  test("linear fusion: alpha blend with missing side = 0") {
    val dense = arm(1L -> 1.0, 2L -> 0.0)  // normalizes to 1.0, 0.0
    val sparse = arm(3L -> 2.0, 2L -> 1.0) // normalizes to 1.0, 0.0
    val out = Fusion.linear(dense, sparse, "id", alpha = 0.7, limit = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 0.7) // dense-only: 0.7*1 + 0.3*0
    assert(out(3L) == 0.3) // sparse-only
    assert(out(2L) == 0.0) // both at min
  }

  test("rrfBatched: per-qid results equal the single-query rrf loop") {
    val dense = Seq(
      (0L, 1L, 0.9), (0L, 2L, 0.8), (0L, 3L, 0.7),
      (1L, 5L, 0.95), (1L, 2L, 0.4)).toDF("qid", "id", "score")
    val sparse = Seq(
      (0L, 2L, 5.0), (0L, 4L, 4.0),
      (1L, 5L, 9.0), (1L, 7L, 3.0)).toDF("qid", "id", "score")
    val batched = Fusion.rrfBatched(dense, sparse, "qid", "id", 60, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for (q <- Seq(0L, 1L)) {
      val single = Fusion.rrf(
          dense.where($"qid" === q).drop("qid"),
          sparse.where($"qid" === q).drop("qid"), "id", 60, 10)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val fromBatch = batched.collect { case ((`q`, id), s) => id -> s }.toMap
      assert(fromBatch == single, s"qid=$q mismatch")
    }
  }

  test("hybridBatched: per-qid results equal the single-query hybrid") {
    val qs = Seq(
      (0L, 0L, Seq("data", "query")),
      (1L, 3L, Seq("spark", "filter")))
    val batched = SearchEngine.hybridBatched(spark, Sf0001, qs, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for ((qid, vecId, terms) <- qs) {
      val single = SearchEngine.hybrid(spark, Sf0001, vecId, terms, 10)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val fromBatch = batched.collect { case ((`qid`, id), s) => id -> s }.toMap
      assert(fromBatch == single, s"qid=$qid mismatch vs single hybrid")
    }
  }

  test("hybridBatchedIvf with all lists probed equals the exact batched hybrid") {
    // nprobe = number of trained centroids scans every list, so the IVF
    // dense arm degenerates to exact brute force — the bench's production
    // path is pinned against the oracle-checked exact twin
    val qs = Seq(
      (0L, 0L, Seq("data", "query")),
      (1L, 3L, Seq("spark", "filter")))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val exact = rows(SearchEngine.hybridBatched(spark, Sf0001, qs, 10))
    val ivfAll = rows(SearchEngine.hybridBatchedIvf(spark, Sf0001, qs, 10,
      nprobe = 16))
    assert(ivfAll == exact && exact.nonEmpty)
    // the production nprobe returns k rows per qid (approximate contents)
    val prod = SearchEngine.hybridBatchedIvf(spark, Sf0001, qs, 10)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(prod == Map(0L -> 10, 1L -> 10), prod.toString)
  }
}
