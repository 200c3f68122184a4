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

  private val BucketCol = "__graft_range_bucket"

  private def bucketOf(c: Column, width: Double): Column =
    floor(c.cast("double") / width).cast("long")

  /** Join each left row (with `pointCol`) to every right row (with
    * `loCol`..`hiCol`, inclusive both ends) whose interval contains the
    * point. Output: left.* ++ right.* (right columns must not collide).
    *
    * Semantics parity with the theta join: an invalid interval
    * (`lo > hi`) matches nothing (it is dropped before the explode — the
    * raw two-arg `sequence` would otherwise auto-step -1 and explode a
    * huge useless DESCENDING bucket list). `maxBucketsPerInterval` turns
    * the pathological wide-interval case (one row asking for millions of
    * replicas — an executor OOM) into an immediate, attributable error;
    * raise `bucketWidth` or cap the intervals to proceed. */
  def pointInInterval(left: DataFrame, pointCol: String,
                      right: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Double,
                      maxBucketsPerInterval: Long = 100000L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(!(left.columns ++ right.columns).contains(BucketCol),
      s"inputs must not contain the reserved column $BucketCol")
    val lb = bucketOf(col(loCol), bucketWidth)
    val hb = bucketOf(col(hiCol), bucketWidth)
    val l = left.withColumn(BucketCol, bucketOf(col(pointCol), bucketWidth))
    val r = right
      .where(col(loCol) <= col(hiCol)) // invalid intervals match nothing
      .withColumn(BucketCol, explode(sequence(lb,
        when(hb - lb >= maxBucketsPerInterval,
          raise_error(concat(lit(s"range join interval wider than " +
            s"$maxBucketsPerInterval buckets (bucketWidth=$bucketWidth) at "),
            col(loCol), lit(".."), col(hiCol))))
          .otherwise(hb))))
    l.join(r, Seq(BucketCol))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop(BucketCol)
  }

  /** Interval-OVERLAP join (`lo_a <= hi_b AND lo_b <= hi_a`, both ends
    * inclusive) as an equi-join — the interval×interval sibling of
    * [[pointInInterval]], which Spark would otherwise nested-loop.
    *
    * Both sides explode to their covering buckets and meet on bucket id.
    * Overlapping intervals can share MANY buckets; instead of a dedup
    * shuffle over the pair output, each pair is emitted only in the
    * canonical FIRST shared bucket — the bucket of `greatest(lo_a, lo_b)`,
    * which every overlapping pair shares (it lies inside both intervals,
    * and bucketing is monotone) and which is unique per pair. So the
    * equi-join output passes two row-local filters and is exact with no
    * distinct pass.
    *
    * Cost: Σ covering-buckets of both sides, shuffled by bucket; wide
    * intervals replicate — tune `bucketWidth` toward the typical interval
    * length, and the `maxBucketsPerInterval` guard turns the pathological
    * case into an attributable error instead of an executor OOM.
    * Works for numeric and timestamp bounds (timestamps bucket at
    * epoch-second granularity via the double cast; the exact predicate
    * runs on the original values).
    */
  def intervalOverlap(left: DataFrame, loA: String, hiA: String,
                      right: DataFrame, loB: String, hiB: String,
                      bucketWidth: Double,
                      maxBucketsPerInterval: Long = 100000L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(!(left.columns ++ right.columns).contains(BucketCol),
      s"inputs must not contain the reserved column $BucketCol")
    def covering(df: DataFrame, lo: String, hi: String): DataFrame = {
      val lb = bucketOf(col(lo), bucketWidth)
      val hb = bucketOf(col(hi), bucketWidth)
      df.where(col(lo) <= col(hi)) // invalid intervals match nothing
        .withColumn(BucketCol, explode(sequence(lb,
          when(hb - lb >= maxBucketsPerInterval,
            raise_error(concat(lit(s"overlap join interval wider than " +
              s"$maxBucketsPerInterval buckets (bucketWidth=$bucketWidth) at "),
              col(lo), lit(".."), col(hi))))
            .otherwise(hb))))
    }
    covering(left, loA, hiA).join(covering(right, loB, hiB), Seq(BucketCol))
      .where(col(loA) <= col(hiB) && col(loB) <= col(hiA))
      .where(col(BucketCol) === bucketOf(greatest(col(loA), col(loB)), bucketWidth))
      .drop(BucketCol)
  }
}
