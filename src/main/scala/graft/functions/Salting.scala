package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key joins (the brief's "salting for skew").
  *
  * A shuffled equi-join sends every row of a hot key to one reducer; with
  * real-world zipfian keys one task ends up with 100× the work. Salting
  * splits each hot key into `factor` sub-keys: the large side gets a
  * deterministic per-row salt, the small side is replicated once per salt
  * value. The join result is identical; the hot key's rows now spread
  * over `factor` reducers. (AQE's skew-join handles sort-merge cases
  * automatically; explicit salting also covers aggregations and older
  * engines — both tools belong in the box.)
  */
object Salting {

  /** Per-row salt: hash of the row content mixed with the row's position
    * (`monotonically_increasing_id`). Content alone is NOT enough — a hot
    * key whose rows are byte-identical (repeated events, denormalized
    * duplicates) would land every copy in one salt bucket and defeat the
    * mitigation. The salt value itself carries no semantics, so positional
    * nondeterminism across runs is harmless: the join result is identical
    * for any salt assignment. */
  private def rowSalt(df: DataFrame, factor: Int) =
    pmod(xxhash64(struct(df.columns.map(col): _*),
      monotonically_increasing_id()), lit(factor))

  /** Equi-join `big ⋈ small` on `key`, salted `factor` ways. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 factor: Int): DataFrame = {
    val bigSalted = big.withColumn("__salt", rowSalt(big, factor))
    val smallExploded = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(factor - 1L))))
    bigSalted.join(smallExploded, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase salted aggregation: partial aggregate on (key, salt), then
    * final aggregate on key. Spark's hash aggregation already partial-aggs
    * map-side, but when a single grouping key dominates the REDUCE side,
    * pre-splitting it bounds any one task's input. */
  def saltedCount(df: DataFrame, key: String, factor: Int): DataFrame =
    df.withColumn("__salt", rowSalt(df, factor))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))
}
