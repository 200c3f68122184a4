package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
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
  * distributed prefix sum, with the buckets derived from the ORDER-KEY
  * VALUE, never from a physical partition id.
  *
  *  - Bucketing: `parts`-quantile boundaries of the order key (one
  *    map-side-combined `percentile_approx` pass, collected once as
  *    plan literals), bucket = #boundaries below the key. Value-derived
  *    bucketing is what makes the two passes AGREE: the obvious
  *    alternative — `repartitionByRange` + `spark_partition_id()` — is
  *    evaluated independently per action, and RangePartitioner's sample
  *    seed is nondeterministic, so pass 1's offsets can be joined
  *    against pass 2's DIFFERENT boundaries (observed at sf0.1: ~1k-row
  *    offset drift). A pure value function cannot disagree with itself.
  *  - Pass 1: ONE partial-aggregated `groupBy(bucket)` — `parts` rows
  *    to the driver; driver state is bounded by the bucket count,
  *    never the data (the same contract as AQE's per-partition stats).
  *  - Pass 2: exclusive per-bucket offsets broadcast back (a
  *    `parts`-row join) plus a window cumsum PARTITIONED BY bucket —
  *    every task scans only its own bucket, in parallel.
  *
  * The result is EXACT and boundary-placement-independent: boundaries
  * only move where the per-bucket sums are cut, not what they add up
  * to, so the recomposed offsets equal the one-task cumsum bit-for-bit
  * at ANY boundary choice (the spec pins ≡ on multi-bucket runs; the
  * DuckDB oracle states the one-window form). Degenerate boundary sets
  * (tiny or constant-key inputs) just mean fewer live buckets — still
  * exact, just less parallel.
  *
  * Offsets in hand, chunk membership is pure per-row arithmetic: a doc
  * starting at `start_off` with `n` tokens occupies bins
  * `floor(start_off/B) .. floor((start_off+max(n,1)-1)/B)` (a 0-token
  * doc degenerates to its start bin, spanning nothing). */
object SeqPack {

  /** Bucket id for `key`: how many of the quantile `boundaries` lie
    * strictly below it (keys equal to a boundary land in the lower
    * bucket — any consistent tie rule works, it only shifts boundary
    * placement). */
  private def bucketOf(key: Column, boundaries: Seq[Double]): Column =
    boundaries.map(b => when(key > lit(b), 1).otherwise(0))
      .foldLeft(lit(0))(_ + _)

  /** `start_off` = exclusive global cumsum of `nTokCol` in `idCol` order,
    * via the two-pass distributed prefix sum described above. Output
    * columns: the input's plus `start_off`. `idCol` must be unique (it
    * is the total order) and numeric-orderable. */
  def globalOffsets(docs: DataFrame, idCol: String, nTokCol: String,
                    parts: Int): DataFrame = {
    require(parts > 0, "parts must be positive")
    // bucket boundaries: (parts-1)-quantiles of the order key, one agg
    // pass, collected ONCE as literals — both passes below share them
    val qs = (1 until parts).map(i => i.toDouble / parts)
    val boundaries: Seq[Double] =
      if (parts == 1) Seq.empty
      else docs.select(percentile_approx(col(idCol).cast("double"),
          array(qs.map(lit): _*), lit(10000)).as("bs"))
        .collect().headOption
        .flatMap(r => Option(r.getSeq[Double](0))).getOrElse(Seq.empty)
    val bucketed = docs.withColumn("__pid",
      bucketOf(col(idCol).cast("double"), boundaries))
    // pass 1: per-bucket token totals — at most `parts` rows (empty
    // buckets don't appear), the only driver-side state
    val partSums = bucketed.groupBy(col("__pid"))
      .agg(sum(col(nTokCol).cast("long")).as("__psum"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    // exclusive prefix over bucket order: bucket i's docs all start at
    // Σ sums(0..i-1) — value-derived buckets are order-consistent by
    // construction, which is what makes the recomposition exact
    val offs = partSums.scanLeft((0, 0L)) { case ((_, acc), (pid, s)) =>
      (pid + 1, acc + s)
    }.init.zip(partSums).map { case ((_, off), (pid, _)) => (pid, off) }
    val spark = docs.sparkSession
    import spark.implicits._
    val offDf = broadcast(offs.toSeq.toDF("__pid", "__off"))
    // pass 2: per-bucket local cumsum + broadcast offset
    val w = Window.partitionBy(col("__pid")).orderBy(col(idCol))
    bucketed.join(offDf, Seq("__pid"))
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

  /** The per-BIN manifest of [[pack]] — the training loader's actual
    * input: for every (bin, doc) intersection, where the doc's tokens
    * sit inside the bin (`off_in_bin`) and how many land there (`len`).
    * This is what drives attention/loss masking at sequence boundaries
    * (tokens of doc A must not attend into doc B) and what makes the
    * packing auditable: per bin, Σ len = budget exactly for every full
    * bin (the spec and the oracle both state it).
    *
    * Plan shape: [[pack]]'s two-pass offsets, then ONE generator
    * (`sequence(first_bin, last_bin)` exploded) — per-row fan-out is the
    * doc's span count, corpus-wide total is exactly
    * ceil(total_tokens/budget) + boundary crossings, so the manifest is
    * output-proportional, never quadratic. Zero-token docs emit nothing
    * (no tokens, nothing to mask). */
  def binManifest(docs: DataFrame, idCol: String, nTokCol: String,
                  budget: Long, parts: Int): DataFrame = {
    val packed = pack(docs, idCol, nTokCol, budget, parts)
      .where(col(nTokCol) > 0)
    packed
      .withColumn("bin", explode(sequence(col("first_bin"), col("last_bin"))))
      .withColumn("__binStart", col("bin") * budget)
      .withColumn("off_in_bin",
        greatest(col("start_off"), col("__binStart")) - col("__binStart"))
      .withColumn("len",
        least(col("start_off") + col(nTokCol).cast("long"),
            col("__binStart") + budget)
          - greatest(col("start_off"), col("__binStart")))
      .select(col("bin"), col(idCol), col("off_in_bin"), col("len"))
  }
}
