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
    val r = right.select(
      (col(keyCol) +: col(rightTime).as("__t") +: lit(0).as("__side") +:
        rightCols.map { case (from, to) => col(from).as(s"__r_$to") }.toSeq): _*)

    val unioned = l.select(
        (leftCols.map(col) :+ col("__t") :+ col("__side")) ++
          rightCols.values.map(to => lit(null).cast(
            r.schema(s"__r_$to").dataType).as(s"__r_$to")): _*)
      .unionByName(r.select(
        (col(keyCol) +: col("__t") +: col("__side") +:
          rightCols.values.map(to => col(s"__r_$to")).toSeq): _*),
        allowMissingColumns = true)

    // Tie-break equal-time right rows on their carried columns so the
    // carried value is deterministic even when the reference side has
    // duplicate timestamps for a key.
    val tieBreak = rightCols.values.map(to => col(s"__r_$to")).toSeq
    val w = Window.partitionBy(col(keyCol))
      .orderBy((col("__t") +: col("__side") +: tieBreak): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = rightCols.values.foldLeft(unioned) { (df, to) =>
      df.withColumn(to, last(col(s"__r_$to"), ignoreNulls = true).over(w))
    }
    carried
      .where(col("__side") === 1)
      .select((leftCols.map(col) ++ rightCols.values.map(col)): _*)
  }
}
