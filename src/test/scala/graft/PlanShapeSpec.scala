package graft

import graft.search.SearchEngine

/** Locks in the perf-critical physical-plan shapes (docs/PLANS.md): a
  * regression that reintroduces a shuffle or a broadcast-build job into
  * the dense path should fail loudly, not just run slower. */
class PlanShapeSpec extends SparkSpec {

  test("dense top-k is a single stage: no exchange, codegen cosine, TakeOrdered") {
    val plan = SearchEngine.denseTopK(spark, Sf0001, 0, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("cosine_sim"), plan)
    assert(!plan.contains("Exchange"), s"dense path must not shuffle:\n$plan")
    assert(!plan.contains("BroadcastExchange"),
      s"query vector must be a literal, not a broadcast:\n$plan")
  }

  test("bm25 pushes its term list into the postings-index scan") {
    val plan = SearchEngine.bm25TopK(spark, Sf0001, Seq("spark", "join"), 10)
      .queryExecution.executedPlan.toString
    // the inverted-index seek: a pushed In(term, ...) on the postings scan
    assert(plan.contains("PushedFilters: [In(term"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("bm25 direct (no-index) path still prunes to query terms before the first shuffle") {
    val plan = graft.search.Bm25
      .topK(graft.tables.Tables.documents(spark, Sf0001), "doc_id", "text",
        Seq("spark", "join"), 10)
      .queryExecution.executedPlan.toString
    assert(plan.indexOf(" IN (spark,join)") > 0, plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("exact match pushes NON-EMPTY equality predicates into both key-index scans") {
    val plan = SearchEngine.exactMatch(spark, Sf0001, "src7", 10)
      .queryExecution.executedPlan.toString
    // bare equality on the ingest-normalized key columns reaches parquet —
    // this is what lets row-group min/max + bloom filters prune at scale.
    assert(plan.contains("EqualTo(source_norm,SRC7)"), plan)
    assert(plan.contains("EqualTo(lang_norm,SRC7)"), plan)
    assert(!plan.contains("PushedFilters: []"),
      s"every scan in the exact-match plan must carry pushed filters:\n$plan")
  }

  test("tfidf search pushes its query buckets into the vectors-index scan") {
    val plan = SearchEngine.tfidfSearch(spark, Sf0001, "spark join", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(bucket"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
