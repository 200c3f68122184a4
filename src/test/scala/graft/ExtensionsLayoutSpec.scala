package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ingest.Store
import graft.tables.Tables

class ExtensionsLayoutSpec extends SparkSpec {

  test("cosine_sim and dot_product are callable from raw SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(3.0, 4.0), array(3.0, 4.0)) AS c, " +
      "dot_product(array(1.0, 2.0), array(3.0, 4.0)) AS d").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
    assert(r.getDouble(1) == 11.0)
    // registration is idempotent
    GraftFunctions.register(spark)
    // implicit cast: double arrays coerce to the float-array input type
    val c2 = spark.sql("SELECT cosine_sim(array(1.0, 0.0), array(0.0, 1.0))")
      .head().getDouble(0)
    assert(c2 == 0.0)
  }

  test("full SQL surface: registered views + functions run a dense search") {
    GraftFunctions.register(spark)
    graft.tables.Tables.registerAll(spark, Sf0001)
    val rows = spark.sql("""
      WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
      SELECT e.vec_id AS id, round(cosine_sim(e.embedding, q.qv), 6) AS score
      FROM embeddings e CROSS JOIN q
      ORDER BY score DESC, id ASC LIMIT 10
    """).collect()
    val api = graft.search.SearchEngine.denseTopK(spark, Sf0001, 0, 10).collect()
    assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      api.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }

  test("extensions class wires the same registrations") {
    // The class is instantiable and exposes the same function set the
    // config-based path (spark.sql.extensions=graft.GraftExtensions) uses.
    val ext = new GraftExtensions()
    assert(GraftFunctions.registrations.map(_._1.funcName).sorted ==
      Seq("cosine_sim", "dot_product"))
    assert(ext != null)
  }

  test("partitioned layout: partition filter prunes directories at the scan") {
    val dir = Files.createTempDirectory("graft-part").toString
    val ev = graft.tables.Tables.events(spark, Sf0001)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
    Store.writePartitioned(ev, s"$dir/events", Seq("day"))
    val back = Store.read(spark, s"$dir/events")
    val oneDay = back.where(col("day") === "2024-01-01")
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("day#"))
    assert(oneDay.count() ==
      ev.where(col("day") === "2024-01-01").count())
  }

  test("simhash pairs: identical docs -> hamming 0; banding is lossless vs brute force") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // exact dup
      (3L, "the quick brown fox jumps over the lazy cat"), // near dup
      (4L, "completely different unrelated content here entirely")
    ).toDF("doc_id", "text")
    val pairs = graft.dedup.Dedup.simhashPairs(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0L))
    // brute-force reference on the same tiny corpus
    val sh = graft.dedup.Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = for {
      a <- sh.keys.toSeq; b <- sh.keys.toSeq if a < b
      ham = java.lang.Long.bitCount(sh(a) ^ sh(b)) if ham <= 3
    } yield (a, b, ham.toLong)
    assert(pairs.toSet == brute.toSet)
  }

  test("optimizeLayout: sorted+bloom layout preserves data and prunes lookups") {
    val dir = Files.createTempDirectory("graft-layout").toString
    val docs = Tables.documents(spark, Sf0001)
    Store.optimizeLayout(docs, s"$dir/by_source", Seq("source", "doc_id"), 4)

    val back = Store.read(spark, s"$dir/by_source")
    assert(back.count() == docs.count())
    // point lookup returns identical rows to the unoptimized table
    val a = back.where(col("source") === "src7").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = docs.where(col("source") === "src7").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b && a.nonEmpty)
    // the predicate reaches the scan (pushdown visible in the plan)
    val plan = back.where(col("source") === "src7").queryExecution
      .executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(source,src7)"))
  }
}
