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

  test("extensions class wires the same registrations") {
    // The class is instantiable and exposes the same function set the
    // config-based path (spark.sql.extensions=graft.GraftExtensions) uses.
    val ext = new GraftExtensions()
    assert(GraftFunctions.registrations.map(_._1.funcName).sorted ==
      Seq("cosine_sim", "dot_product"))
    assert(ext != null)
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
