package graft.tools

import org.apache.spark.sql.functions._

import graft.index.Bm25Index

/** Throwaway forensics main: quantify the s34 design claim — cursor
  * (`search_after`) pagination stays flat with page depth while
  * OFFSET-paging pays for every row it discards. Both forms run the
  * same pushed postings seek and partial agg; the difference is what
  * reaches the final ordering: the cursor filter drops pre-cursor rows
  * BEFORE the top-k, OFFSET drags offset+k rows through it. Not part
  * of the library surface.
  */
object ProbePaging {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val idx = Bm25Index.ensure(spark, d)
    val terms = Seq("the", "a", "data") // broad lists: deep result set
    val k = 10

    def median(f: => Unit): Double = {
      f // warm
      (1 to 5).map { _ =>
        val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
      }.sorted.apply(2)
    }

    // total result set size, and the cursor rows at each probed depth
    // (taken from one sorted collect — probe bookkeeping, not the
    // pattern under test; a real client walks the chain)
    val full = spark.read.parquet(s"$idx/postings")
      .where(col("term").isin(terms: _*))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("w")), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .collect()
    println(s"PROBE result_set=${full.length}")

    for (depth <- Seq(10, 100, 1000, full.length / k - 1).distinct
           .filter(d => d >= 1 && d * k <= full.length)) {
      val last = full(depth * k - 1)
      val (cid, cs) = (last.getLong(0), last.getDouble(1))
      val tCursor = median {
        Bm25Index.topKAfter(spark, idx, "doc_id", terms, k, cs, cid).collect()
      }
      // the OFFSET spelling of the same page: everything before it rides
      // through the final ordering and is discarded
      val tOffset = median {
        spark.read.parquet(s"$idx/postings")
          .where(col("term").isin(terms: _*))
          .groupBy(col("doc_id"))
          .agg(round(sum(col("w")), 6).as("score"))
          .orderBy(col("score").desc, col("doc_id").asc)
          .offset(depth * k).limit(k)
          .collect()
      }
      println(f"PROBE page_depth=$depth cursor=$tCursor%.3f offset=$tOffset%.3f")
    }
    spark.stop()
  }
}
