package graft.tools

import org.apache.spark.storage.StorageLevel

import graft.search.SearchEngine
import graft.tables.Tables

/** Forensics main for the BENCHNOTES filtered-ANN router table: times
  * `SearchEngine.filteredAnn` end-to-end (stats probe + routed plan) at
  * three selectivity/crossover points under the Bench regime (persisted
  * base tables, warm JIT, warm p50-of-3). Not part of the library
  * surface.
  *
  *   SPARK_GRAFT_SF_DIR=... sbt 'runMain graft.tools.ProbeFilteredAnn'
  */
object ProbeFilteredAnn {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Tables.names.foreach { n =>
      Tables(spark, d, n).persist(StorageLevel.MEMORY_AND_DISK).count()
    }
    // first-touch index builds outside every timed region
    graft.index.IvfIndex.ensure(spark, d)
    graft.index.KnnGraphIndex.edges(spark, d, 3, 5).count()

    val cases = Seq(
      ("source=src3  (~5% pass), crossover 0.5", "source", "src3", 0.5),
      ("lang=en     (~39% pass), crossover 0.5", "lang", "en", 0.5),
      ("lang=en     (~39% pass), crossover 0.2", "lang", "en", 0.2))
    for ((label, f, v, xo) <- cases) {
      def run(): (String, Double) = {
        val t0 = System.nanoTime()
        val (route, df) =
          SearchEngine.filteredAnn(spark, d, 0L, f, v, 10, crossover = xo)
        df.count()
        (route, (System.nanoTime() - t0) / 1e9)
      }
      run(); run() // plan compile + codegen warm-ups, discarded
      val rs = Seq.fill(3)(run())
      val p50 = rs.map(_._2).sorted.apply(1)
      println(f"PROBE_FANN $label -> route=${rs.head._1} p50=$p50%.3f s")
    }
    spark.stop()
  }
}
