package graft

/** Throwaway per-query timing harness (not part of the library surface). */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val qs = SparkEntry.queries
    val names = if (args.nonEmpty && args(0) != "-") args(0).split(",").toSeq
                else qs.keys.toSeq.sorted
    for (n <- names) {
      qs(n)(spark, d).write.mode("overwrite").format("noop").save() // warm
      val t0 = System.nanoTime
      qs(n)(spark, d).write.mode("overwrite").format("noop").save()
      println(f"TIME $n%-22s ${(System.nanoTime - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
