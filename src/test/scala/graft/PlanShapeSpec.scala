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

  test("bm25 prunes to query terms before the first shuffle") {
    val plan = SearchEngine.bm25TopK(spark, Sf0001, Seq("spark", "join"), 10)
      .queryExecution.executedPlan.toString
    val filterIdx = plan.indexOf("term#")
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning")
    assert(filterIdx >= 0 && exchangeIdx >= 0)
    // plan prints top-down: the exchange appears above (before) the
    // term filter that feeds it from below
    assert(plan.indexOf(" IN (spark,join)") > 0, plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("exact match pushes its predicates into the parquet scan") {
    val plan = SearchEngine.exactMatch(spark, Sf0001, "src7", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("upper") || plan.contains("SRC7"), plan)
  }
}
