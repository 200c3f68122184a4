package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Dev probe: stage attribution for the inverted-index Jaccard family
  * (d2/d20/d22) — r15 notes. */
object ProbeD2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("probe-d2").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    val docs = graft.tables.Tables.documents(spark, dir)
    for (rnd <- 1 to 3) {
      println(s"--- round $rnd ---")
      val shingled = docs.withColumn("__blk", lit(1))
        .select(col("doc_id"), col("__blk"), TextOps.tokens(col("text")).as("__toks"))
        .select(col("doc_id"), col("__blk"),
          explode(TextOps.shingles(col("__toks"), 3)).as("shingle"))
      val inv = t("inv localCheckpoint") {
        val i = shingled.localCheckpoint(); i.count(); i
      }
      println("    inv rows=" + inv.count())
      t("sizes agg") {
        inv.groupBy(col("doc_id")).agg(count(lit(1)).as("sz")).count()
      }
      val common = inv.select(col("__blk"), col("doc_id").as("id_a"), col("shingle"))
        .join(inv.select(col("__blk"), col("doc_id").as("id_b"), col("shingle")),
          Seq("__blk", "shingle"))
        .where(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("common"))
      t("common join+agg")(println("    pairs=" + common.count()))
      t("full ngramJaccard") {
        graft.dedup.Dedup.ngramJaccard(
          docs.withColumn("__blk", lit(1)), "doc_id", "text", "__blk", 3, 0.5).count()
      }
      // --- prefix-filtered (PPJoin-style) prototype ---
      val threshold = 0.5
      import org.apache.spark.sql.expressions.Window
      val dfreq = inv.groupBy(col("__blk"), col("shingle"))
        .agg(count(lit(1)).as("__df"))
      val wDoc = Window.partitionBy(col("doc_id"))
      val ranked = inv.join(dfreq, Seq("__blk", "shingle"))
        .withColumn("__rnk", row_number().over(
          wDoc.orderBy(col("__df").asc, col("shingle").asc)))
        .withColumn("__sz", count(lit(1)).over(wDoc))
      val prefix = ranked
        .where(col("__rnk") <=
          col("__sz") - ceil(col("__sz") * lit(threshold) - lit(1e-9)) + 1)
        .select(col("__blk"), col("doc_id").as("__pid"), col("shingle"))
      val cand = prefix
        .join(inv.select(col("__blk"), col("doc_id").as("__fid"), col("shingle")),
          Seq("__blk", "shingle"))
        .where(col("__pid") =!= col("__fid"))
        .select(least(col("__pid"), col("__fid")).as("id_a"),
          greatest(col("__pid"), col("__fid")).as("id_b"))
        .distinct()
      t("prefix cand")(println("    cand=" + cand.count()))
      val docsets = inv.groupBy(col("doc_id"))
        .agg(sort_array(collect_list(col("shingle"))).as("__set"))
      val verified = cand
        .join(docsets.select(col("doc_id").as("id_a"), col("__set").as("__sa")), Seq("id_a"))
        .join(docsets.select(col("doc_id").as("id_b"), col("__set").as("__sb")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          size(array_intersect(col("__sa"), col("__sb"))).as("common"),
          size(col("__sa")).as("sz_a"), size(col("__sb")).as("sz_b"))
        .withColumn("jaccard", round(col("common").cast("double") /
          (col("sz_a") + col("sz_b") - col("common")), 6))
        .where(col("jaccard") >= threshold)
      t("prefix verified")(println("    pairs=" + verified.count()))
    }
    spark.stop()
  }
}
