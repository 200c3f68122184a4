package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.{Sampling, TextOps}

/** Capstone integration test: the full training-data pipeline composed
  * end to end over the fixture corpus —
  *
  *   ingest → PII scrub → quality gate → language filter →
  *   exact+near dedup (detect → cluster → apply) →
  *   deterministic stratified sample → sequence packing → export shape
  *
  * Asserts the system-level contracts: corpus shrinks monotonically
  * through the destructive stages, every intermediate schema is what the
  * next stage needs, and the WHOLE pipeline is bit-deterministic — a
  * second run over the same input yields the identical final dataset.
  */
class PipelineE2ESpec extends SparkSpec {

  private def runPipeline(): (Seq[Long], Seq[(String, Long, Long)]) = {
    val raw = graft.tables.Tables.documents(spark, Sf0001)
    val n0 = raw.count()

    // 1. scrub + annotate (non-destructive: adds columns)
    val scrubbed = raw
      .withColumn("clean_text", TextOps.redactPii(col("text")))
      .withColumn("quality", TextOps.qualityScore(col("clean_text")))
      .withColumn("pred_lang", TextOps.langId(TextOps.tokens(col("clean_text"))))
      .withColumn("n_tok", TextOps.tokenCountWs(col("clean_text")).cast("long"))

    // 2. quality gate
    val gated = scrubbed.where(col("quality") >= 0.3 && col("n_tok") >= 3)
    val n2 = gated.count()
    assert(n2 <= n0 && n2 > 0)

    // 3. dedup: exact groups drop non-keepers, then simhash near-dup
    //    clusters drop non-keepers
    val exactLosers = gated
      .select(col("doc_id"),
        array_join(array_sort(array_distinct(TextOps.tokens(col("clean_text")))), " ")
          .as("k"))
      .withColumn("keeper", min(col("doc_id"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("k"))))
      .where(col("doc_id") =!= col("keeper"))
      .select(col("doc_id"))
    val afterExact = gated.join(exactLosers, Seq("doc_id"), "left_anti")

    val nearPairs = Dedup.simhashPairs(
      afterExact.select(col("doc_id"), col("clean_text").as("text")),
      "doc_id", "text", 3)
    val nearLosers = Dedup.connectedComponents(nearPairs, "id_a", "id_b")
      .where(col("id") =!= col("keeper"))
      .select(col("id").as("doc_id"))
    val deduped = afterExact.join(nearLosers, Seq("doc_id"), "left_anti")
    val n3 = deduped.count()
    assert(n3 <= n2 && n3 > 0)

    // 4. deterministic stratified sample on the PREDICTED language
    val sampled = Sampling.hashSampleBy(deduped, "doc_id", "pred_lang",
      Map("en" -> 9000, "de" -> 9000, "es" -> 9000, "fr" -> 9000, "zh" -> 9000))
    val n4 = sampled.count()
    assert(n4 <= n3 && n4 > 0)

    // 5. pack into 100-token bins per language
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pred_lang")).orderBy(col("doc_id"))
    val packed = sampled
      .withColumn("bin_id",
        floor((sum(col("n_tok")).over(w) - col("n_tok")) / 100L).cast("long"))

    // 6. export shape: fixed column order, deterministic row order
    val export = packed
      .select(col("doc_id"), col("pred_lang"), col("bin_id"), col("n_tok"),
        col("clean_text"))
      .orderBy(col("pred_lang"), col("bin_id"), col("doc_id"))

    val ids = export.select("doc_id").collect().map(_.getLong(0)).toSeq
    val bins = export.groupBy(col("pred_lang"), col("bin_id"))
      .agg(sum(col("n_tok")).as("toks"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      .sortBy(t => (t._1, t._2))

    // 7. seeded shuffle + shard assignment (the write step): every
    //    exported doc lands in exactly one of 4 shards, positions dense
    val sharded = Sampling.seededShard(export, "doc_id", "ep0", 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(sharded.map(_._1).sorted.toSeq == ids.sorted)
    sharded.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq)
    }
    (ids, bins)
  }

  test("full pipeline: scrub -> gate -> dedup -> sample -> pack -> export, deterministic") {
    val (ids1, bins1) = runPipeline()
    assert(ids1.nonEmpty)
    assert(ids1.distinct.size == ids1.size) // no doc survives twice
    // every bin respects the shape: positive token totals
    assert(bins1.forall(_._3 > 0))
    // the entire composed pipeline is reproducible bit-for-bit
    val (ids2, bins2) = runPipeline()
    assert(ids1 == ids2 && bins1 == bins2)
  }
}
