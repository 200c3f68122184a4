package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — the canonical "operator Spark lacks"
  * (brief §custom operators, tier (a): composed from existing ops because
  * the semantics allow it).
  *
  * For every left row, attach the single right row with the same key and
  * the greatest right-time <= left-time.
  *
  * Implementation is the union-and-window formulation, NOT a range join:
  * tag both sides, union them, and per key carry the last-seen right row
  * forward with `last_value(..., ignoreNulls)` over an ordered window.
  * One shuffle on the key, linear in |left| + |right| — a range-condition
  * join would rescan right rows per left row and skew-explode on hot keys
  * at 100 TB. Right-side timestamps sort before equal left timestamps
  * (tie-break column), giving inclusive `rtime <= ltime` semantics.
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      reference side (its latest prior row is attached)
    * @param keyCol     equi-join key present on both sides
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param rightCols  columns of `right` to carry (renamed as given)
    * @return `left.*` plus each requested right column (null when no prior
    *         right row exists) */
  def asof(left: DataFrame, right: DataFrame, keyCol: String,
           leftTime: String, rightTime: String,
           rightCols: Map[String, String]): DataFrame = {
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1)) // left sorts AFTER right at equal times
    val leftCols = left.columns
    // ALL carried right columns ride in ONE struct so the window carries
    // them atomically: per-column independent last(ignoreNulls) calls (the
    // round-1 shape) could mix values from DIFFERENT right rows when some
    // carried columns are null. The struct is also the tie-break key for
    // duplicate (key, rtime) right rows — field-by-field ordering, so the
    // carried row is deterministic (the struct-max one). NOTE: SQL ASOF
    // JOIN leaves the duplicate-(key, ts) winner unspecified, so oracle
    // comparisons (q11) assume the reference side is duplicate-free per
    // (key, ts); dedupe it first if it isn't.
    val r = right.select(col(keyCol), col(rightTime).as("__t"),
      lit(0).as("__side"),
      struct(rightCols.map { case (from, to) => col(from).as(to) }.toSeq: _*)
        .as("__r"))

    val unioned = l.select(
        (leftCols.map(col) :+ col("__t") :+ col("__side") :+
          lit(null).cast(r.schema("__r").dataType).as("__r")): _*)
      .unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__t"), col("__side"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = unioned
      .withColumn("__rc", last(col("__r"), ignoreNulls = true).over(w))
    carried
      .where(col("__side") === 1)
      .select((leftCols.map(col) ++
        rightCols.values.map(to => col(s"__rc.$to").as(to))): _*)
  }
}
