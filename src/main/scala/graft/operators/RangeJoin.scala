package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketized range join — point-in-interval joins as an EQUI-join.
  *
  * Spark plans `left.point BETWEEN right.lo AND right.hi` as a
  * BroadcastNestedLoopJoin (or worse, a cartesian) because there is no
  * equi-key — O(|L|·|R|) comparisons, the classic scale cliff. The
  * standard fix: quantize the number line into buckets of `bucketWidth`;
  * each left point lands in exactly one bucket, each right interval
  * explodes to the buckets it overlaps, and the join becomes an equi-join
  * on the bucket id followed by the exact BETWEEN filter.
  *
  * A (point, interval) pair can only meet in the point's single bucket,
  * so no dedup pass is needed — the equi-join output is already unique
  * per pair. Cost: |L| + Σ(interval width / bucketWidth) join rows,
  * shuffled by bucket — skew maps to wide intervals, which is tunable by
  * `bucketWidth` (narrower buckets = more replication, less skew).
  */
object RangeJoin {

  private def bucketOf(c: Column, width: Double): Column =
    floor(c.cast("double") / width).cast("long")

  /** Join each left row (with `pointCol`) to every right row (with
    * `loCol`..`hiCol`, inclusive both ends) whose interval contains the
    * point. Output: left.* ++ right.* (right columns must not collide). */
  def pointInInterval(left: DataFrame, pointCol: String,
                      right: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Double): DataFrame = {
    val l = left.withColumn("__bucket", bucketOf(col(pointCol), bucketWidth))
    val r = right.withColumn("__bucket",
      explode(sequence(bucketOf(col(loCol), bucketWidth),
        bucketOf(col(hiCol), bucketWidth))))
    l.join(r, Seq("__bucket"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
