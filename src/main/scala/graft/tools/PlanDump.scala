package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: print the executed physical plan of selected operators —
  * the evidence pasted into docs/PLANS.md.
  *   runMain graft.tools.PlanDump <sfDir> <name> [name...]
  * Names: pq_adc, chunk_dedup, surprisal, repetition, semdedup.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("pq_adc", "chunk_dedup", "surprisal", "repetition", "semdedup")
    val spark = SparkSession.builder()
      .appName("graft-plandump").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.tables.Tables.documents(spark, dir)
    val emb = graft.tables.Tables.embeddings(spark, dir)
    def plan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString

    names.foreach { n =>
      val p = n match {
        case "pq_adc" =>
          val cb = graft.search.Ann.pqCodebooks(emb, 4, 16, 16)
          val qv = emb.where(col("vec_id") === 0).select(col("embedding").as("qvec"))
          plan(graft.search.Ann.pqTopKReranked(emb, cb, qv, 4, 16, 10))
        case "chunk_dedup" => plan(graft.dedup.Dedup.chunkDedup(docs))
        case "surprisal" => plan(graft.functions.CorpusStats.unigramSurprisal(docs))
        case "repetition" => plan(graft.functions.CorpusStats.repetitionMetrics(docs))
        case "semdedup" =>
          val cent = emb.where(col("vec_id") < 10)
            .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
          plan(graft.search.Ann.semDedup(emb, cent, 0.35))
        case "curation" =>
          plan(graft.functions.CorpusStats.curationVerdict(docs))
        case "dup_ngrams" =>
          plan(graft.dedup.Dedup.duplicatedNgrams(docs, "doc_id", "text", 3, 0.8))
        case "vocab_oov" =>
          plan(graft.functions.CorpusStats.vocabOovRates(docs, 100))
        case "source_caps" =>
          plan(graft.functions.Sampling.capPerGroup(
            docs.select(col("doc_id"), col("source"), col("n_chars")),
            "source", "n_chars", "doc_id", 10))
        case "winnowing" =>
          plan(graft.dedup.Dedup.winnowedFingerprints(docs, "doc_id", "text"))
        case "winnow_pairs" =>
          plan(graft.dedup.Dedup.winnowingPairs(docs, "doc_id", "text"))
        case other => s"(unknown plan name: $other)"
      }
      println(s"=== $n ===")
      println(p)
    }
    spark.stop()
  }
}
