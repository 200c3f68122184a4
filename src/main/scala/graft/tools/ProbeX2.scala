package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage attribution of x2_mllib_lsh_neardup's cost
  * (fit / transform / LSH fit / approx join / exact twin). Feeds the r15
  * optimization notes. */
object ProbeX2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("probe-x2").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    for (round <- 1 to 3) {
      println(s"--- round $round ---")
      val docs = t("docs limit 500") {
        val d = graft.tables.Tables.documents(spark, dir)
          .orderBy(col("doc_id")).limit(500).localCheckpoint()
        d.count(); d
      }
      val model = t("fitEmbedder")(graft.index.MlIndex.fitEmbedder(docs, "text", 64))
      val embedded = t("transform+ckpt") {
        val e = model.transform(docs).localCheckpoint(); e.count(); e
      }
      val ann = t("fitAnn")(graft.index.MlIndex.fitAnn(embedded, numHashTables = 8))
      val lshPairs = graft.index.MlIndex.approxNearDup(ann, embedded, embedded, 1.0)
        .selectExpr("datasetA.doc_id AS id_a", "datasetB.doc_id AS id_b",
          "round(dist, 6) AS dist")
        .where(col("id_a") < col("id_b"))
      t("approx join count")(println("    n=" + lshPairs.count()))
      val fa = embedded.select(col("doc_id").as("ea"),
        org.apache.spark.ml.functions.vector_to_array(col("features")).as("va"))
      val fb = fa.select(col("ea").as("eb"), col("va").as("vb"))
      val exactN = fa.crossJoin(fb)
        .where(col("ea") < col("eb"))
        .where(sqrt(aggregate(zip_with(col("va"), col("vb"),
          (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)) <= 1.0)
        .agg(count(lit(1)).as("__exact_n"))
      t("exact twin")(println("    exact=" + exactN.collect()(0).getLong(0)))
    }
    spark.stop()
  }
}
