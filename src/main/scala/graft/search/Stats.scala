package graft.search

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Service-level stats (reference §2.11 Q13 health/stats + §2.4 A4 EWMA
  * latency tracking, `app/services/search_service.py:254,297,340,368-370`;
  * `app/api/endpoints/health.py:17-71`).
  */
object Stats {

  /** A4: driver-side EWMA latency tracker, one cell per stage name.
    * avg' = avg*0.9 + x*0.1, exactly the reference's smoothing. */
  final class Ewma(alpha: Double = 0.1) {
    private val cells = new ConcurrentHashMap[String, java.lang.Double]()
    def record(stage: String, millis: Double): Double =
      cells.merge(stage, millis,
        (old, x) => old * (1 - alpha) + x * alpha).doubleValue()
    def get(stage: String): Option[Double] = Option(cells.get(stage)).map(_.doubleValue())
    def snapshot: Map[String, Double] =
      { import scala.jdk.CollectionConverters._
        cells.asScala.map { case (k, v) => k -> v.doubleValue() }.toMap }

    /** Time a block and record it. */
    def timed[T](stage: String)(f: => T): T = {
      val t0 = System.nanoTime()
      try f finally record(stage, (System.nanoTime() - t0) / 1e6)
    }
  }

  /** Q13: collection stats — document count, per-source breakdown. */
  def collectionStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
      .orderBy(col("source"))

  /** Q13: health check — one row per table with row count (the driver's
    * `get_document_count` writ large). */
  def healthCounts(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.names.map { n =>
      Tables(spark, dir, n).agg(lit(n).as("table"), count(lit(1)).as("n_rows"))
    }
    counts.reduce(_ unionByName _).orderBy(col("table"))
  }
}
