package graft

import graft.serve.Api

/** End-to-end: `/api/...`-shaped requests against the fixture store,
  * exercising the reference's parameter semantics (mode validation, count
  * bounds, filters, fusion, lean projection, admin export). */
class ServeApiSpec extends SparkSpec {

  private def get(path: String, params: (String, String)*): Api.Response =
    Api.handle(spark, Sf0001, path, params.toMap)

  test("health reports per-table counts") {
    val r = get("/health")
    assert(r.status == 200, r.body)
    assert(r.body.contains("\"status\":\"healthy\""))
    assert(r.body.contains("\"documents\":"))
  }

  test("query endpoint: all three modes return ranked hits; bad mode is a 400") {
    for (mode <- Seq("dense", "sparse", "hybrid")) {
      val r = get("/api/query", "q" -> "spark join filter", "mode" -> mode, "limit" -> "5")
      assert(r.status == 200, s"$mode: ${r.body}")
      assert(r.body.contains(s""""mode":"$mode""""), r.body)
      assert(r.body.contains("\"score\":"), r.body)
    }
    val bad = get("/api/query", "q" -> "x", "mode" -> "telepathy")
    assert(bad.status == 400 && bad.body.contains("Invalid mode"), bad.body)
  }

  test("query endpoint: missing q is a 422; out-of-range limit is a 422") {
    assert(get("/api/query").status == 422)
    val r = get("/api/query", "q" -> "x", "limit" -> "0")
    assert(r.status == 422 && r.body.contains("limit"), r.body)
  }

  test("search endpoint: full details envelope, filter path, fusion path") {
    val plain = get("/api/search", "q" -> "spark join filter", "count" -> "5")
    assert(plain.status == 200, plain.body)
    assert(plain.body.contains("\"image\":") && plain.body.contains("\"price\":"), plain.body)

    val filtered = get("/api/search", "q" -> "spark join filter",
      "filter_field" -> "lang", "filter_value" -> "en", "count" -> "5")
    assert(filtered.status == 200, filtered.body)

    val fused = get("/api/search", "q" -> "src7", "use_fusion" -> "true", "count" -> "5")
    assert(fused.status == 200, fused.body)

    val tooMany = get("/api/search", "q" -> "x", "count" -> "101")
    assert(tooMany.status == 422, tooMany.body)
  }

  test("fusion: exact part-number hit ranks 1.0 ahead of vector hits") {
    val r = get("/api/fusion-search", "q" -> "src7", "limit" -> "5")
    assert(r.status == 200, r.body)
    assert(r.body.contains("\"search_type\":\"exact\""), r.body)
    assert(r.body.contains("\"score\":1.0"), r.body)
  }

  test("lean search returns only id+score fields") {
    val r = get("/api/lean-search", "q" -> "spark join", "limit" -> "3")
    assert(r.status == 200, r.body)
    assert(r.body.contains("\"id\":") && r.body.contains("\"score\":"))
    assert(!r.body.contains("\"text\"") && !r.body.contains("\"image\""))
  }

  test("compare reports counts and top score per mode") {
    val r = get("/api/search/compare", "q" -> "spark join filter", "limit" -> "5")
    assert(r.status == 200, r.body)
    for (m <- Seq("dense", "sparse", "hybrid"))
      assert(r.body.contains(s""""$m":{"n_results":"""), r.body)
  }

  test("documents point read: hit and 404") {
    val hit = get("/api/documents", "id" -> "7")
    assert(hit.status == 200 && hit.body.contains("\"doc_id\":7"), hit.body)
    assert(get("/api/documents", "id" -> "999999").status == 404)
  }

  test("admin export honors cap and ships full rows; unknown route is a 404") {
    val r = get("/api/admin/export", "limit" -> "3")
    assert(r.status == 200, r.body)
    assert(r.body.contains("\"exported\":3"), r.body)
    assert(get("/api/nope").status == 404)
  }

  test("performance stats expose EWMA cells after traffic") {
    get("/api/query", "q" -> "spark", "mode" -> "dense")
    val r = get("/api/performance-stats")
    assert(r.status == 200 && r.body.contains("query_dense"), r.body)
  }
}
