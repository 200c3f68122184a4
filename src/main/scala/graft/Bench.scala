package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

import graft.tables.Tables

/** Benchmark main: steady-state per-query latency on SPARK_GRAFT_SF_DIR.
  *
  * BASELINE.md's reference numbers are warm-path figures (RAM-resident
  * HNSW, LRU-cached query embeddings), so we measure the same regime:
  * tables persisted in memory (reference O6 `on_disk=False`), one warm-up
  * run per query (plan compilation + codegen), then median of 3 timed
  * runs. Prints ONE JSON line for the driver.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Warm path: persist base tables once. Spark's CacheManager matches by
    // canonicalized plan, so every query's fresh `read.parquet` of the
    // same path hits this cache.
    Tables.names.foreach { n =>
      Tables(spark, sfDir, n).persist(StorageLevel.MEMORY_AND_DISK).count()
    }

    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t =
        try {
          val warm = timeOnce(fn) // warm-up: plan + codegen + cache fill
          if (warm > 2.5) {
            // heavy query: one timed run keeps total bench time bounded
            timeOnce(fn)
          } else {
            val runs = Seq.fill(3)(timeOnce(fn)).sorted
            runs(1) // median
          }
        } catch { case _: Throwable => -1.0 }
      name -> t
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
