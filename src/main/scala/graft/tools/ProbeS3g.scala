package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage attribution for s3g_bm25_maxscore (r15 notes). */
object ProbeS3g {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("probe-s3g").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    val idx = graft.index.Bm25Index.ensure(spark, dir)
    val terms = Seq("dup", "the", "a")
    for (rnd <- 1 to 3) {
      println(s"--- round $rnd ---")
      val posts = spark.read.parquet(s"$idx/postings")
        .where(col("term").isin(terms: _*))
      val ubs = t("ubs collect") {
        spark.read.parquet(s"$idx/termstats")
          .where(col("term").isin(terms: _*))
          .select(col("term"), col("maxw"))
          .collect().map(r => (r.getString(0), r.getDouble(1)))
          .sortBy { case (tm, u) => (-u, tm) }
      }
      val t1 = ubs.head._1
      val t1Docs = posts.where(col("term") === t1).select(col("doc_id")).distinct()
      val seedTop = t("seed collect") {
        posts.join(broadcast(t1Docs), Seq("doc_id"))
          .groupBy(col("doc_id")).agg(round(sum(col("w")), 6).as("score"))
          .orderBy(col("score").desc, col("doc_id").asc).limit(10)
          .collect()
      }
      val theta = seedTop.map(_.getDouble(1)).min
      val suffix = ubs.map(_._2).scanRight(0.0)(_ + _)
      val p = (1 to ubs.length)
        .find(i => suffix(i) < theta - 1e-6).getOrElse(ubs.length)
      val essential = ubs.take(p).map(_._1)
      println(s"    essential=$essential theta=$theta")
      val cands = posts.where(col("term").isin(essential: _*))
        .select(col("doc_id")).distinct()
      t("final count") {
        posts.join(broadcast(cands), Seq("doc_id"))
          .groupBy(col("doc_id"))
          .agg(round(sum(col("w")), 6).as("score"))
          .orderBy(col("score").desc, col("doc_id").asc)
          .limit(10).count()
      }
      t("full topKMaxScore") {
        graft.index.Bm25Index.topKMaxScore(spark, idx, "doc_id", terms, 10).count()
      }
      t("plain exact topK") {
        posts.groupBy(col("doc_id")).agg(round(sum(col("w")), 6).as("score"))
          .orderBy(col("score").desc, col("doc_id").asc).limit(10).count()
      }
    }
    spark.stop()
  }
}
