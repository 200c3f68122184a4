package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GLOBAL concat-and-chunk sequence packing — the GPT-pretraining batch
  * layout (concatenate every document in a fixed global order, cut the
  * token stream every `budget` tokens; documents SPAN chunk boundaries).
  * The per-stratum greedy packing lives in `t9_sequence_packing`; this is
  * the other packing the training stack needs, and the one with the
  * scale trap: each document's placement is its GLOBAL token offset — a
  * corpus-wide cumulative sum — and the naive Spark spelling
  * (`Window.orderBy(id)` with no partition spec) funnels the entire
  * corpus through ONE task. At 100 TB that plan does not finish.
  *
  * [[globalOffsets]] is the scale-correct spelling: the classic two-pass
  * distributed prefix sum.
  *
  *  - Pass 1: range-repartition on the order key (so partition `i`'s
  *    keys all precede partition `i+1`'s), then ONE partial-aggregated
  *    `groupBy(partition_id)` — the result is `parts` rows, collected to
  *    the driver. Driver state is bounded by the PARTITION COUNT, never
  *    the data (the same contract as AQE's per-partition statistics).
  *  - Pass 2: exclusive per-partition offsets broadcast back (a
  *    `parts`-row join), plus a window cumsum PARTITIONED BY partition
  *    id — every task scans only its own partition, in parallel.
  *
  * The result is EXACT and boundary-placement-independent: range
  * partitioning only moves where the per-partition sums are cut, not
  * what they add up to, so the recomposed offsets equal the one-task
  * cumsum bit-for-bit (the spec pins ≡ on a multi-partition run; the
  * DuckDB oracle states the one-window form).
  *
  * Offsets in hand, chunk membership is pure per-row arithmetic: a doc
  * starting at `start_off` with `n` tokens occupies bins
  * `floor(start_off/B) .. floor((start_off+max(n,1)-1)/B)` (a 0-token
  * doc degenerates to its start bin, spanning nothing). */
object SeqPack {

  /** `start_off` = exclusive global cumsum of `nTokCol` in `idCol` order,
    * via the two-pass distributed prefix sum described above. Output
    * columns: the input's plus `start_off`. `idCol` must be unique (it
    * is the total order). */
  def globalOffsets(docs: DataFrame, idCol: String, nTokCol: String,
                    parts: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranged = docs.repartitionByRange(parts, col(idCol))
      .withColumn("__pid", spark_partition_id())
    // pass 1: per-partition token totals — `parts` rows at most (empty
    // partitions simply don't appear), the only driver-side state
    val partSums = ranged.groupBy(col("__pid"))
      .agg(sum(col(nTokCol).cast("long")).as("__psum"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    // exclusive prefix over pid order: partition i's docs all start at
    // Σ sums(0..i-1) — range partitioning guarantees pid order == key
    // order, which is what makes the recomposition exact
    val offs = partSums.scanLeft((0, 0L)) { case ((_, acc), (pid, s)) =>
      (pid + 1, acc + s)
    }.init.zip(partSums).map { case ((_, off), (pid, _)) => (pid, off) }
    val offDf = broadcast(offs.toSeq.toDF("__pid", "__off"))
    // pass 2: per-partition local cumsum + broadcast offset
    val w = Window.partitionBy(col("__pid")).orderBy(col(idCol))
    ranged.join(offDf, Seq("__pid"))
      .withColumn("start_off",
        col("__off") + sum(col(nTokCol).cast("long")).over(w)
          - col(nTokCol).cast("long"))
      .drop("__pid", "__off")
  }

  /** [[globalOffsets]] plus chunk membership: `first_bin`, `last_bin`,
    * `n_bins` for budget-`B` chunks of the concatenated token stream. */
  def pack(docs: DataFrame, idCol: String, nTokCol: String,
           budget: Long, parts: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    globalOffsets(docs, idCol, nTokCol, parts)
      .withColumn("first_bin", floor(col("start_off") / budget))
      .withColumn("last_bin",
        floor((col("start_off")
          + greatest(col(nTokCol).cast("long"), lit(1L)) - 1) / budget))
      .withColumn("n_bins", col("last_bin") - col("first_bin") + 1L)
  }
}
