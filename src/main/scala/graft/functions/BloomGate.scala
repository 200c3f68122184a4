package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter blocklist gate: EXACT set-difference semantics at a
  * fraction of the anti-join shuffle cost.
  *
  * The 100 TB problem: "drop every corpus document whose key appears in a
  * blocklist" (eval-set contamination, takedown lists, previously-ingested
  * fingerprints) is a left-anti join — and a plain anti-join shuffles the
  * ENTIRE corpus by key even though almost no corpus row matches. The
  * bloom gate splits the corpus with a compact sketch of the blocklist
  * (built by Spark's own `BloomFilterAggregate`, the machinery behind AQE
  * runtime row-filters; a few MB regardless of blocklist row count,
  * broadcast as a plan literal):
  *
  *  - `might_contain == false` → definitely NOT blocked (bloom filters
  *    have no false negatives): kept with ZERO shuffle, straight off the
  *    scan, whole-stage codegen.
  *  - `might_contain == true` → probably blocked (false-positive rate
  *    `fpp`): only this sliver — |blocked| + fpp·|corpus| rows — pays the
  *    exact confirming anti-join.
  *
  * False positives are removed by the confirm join and false negatives
  * cannot occur, so the union of the two arms is EXACTLY the anti-join
  * result — which is why d15's DuckDB oracle is a plain `NOT IN`.
  *
  * This is the same trick Spark's `InjectRuntimeFilter` plays inside a
  * single join; materializing it as an operator lets a pipeline reuse one
  * blocklist sketch across many scans (the reference re-checks its
  * processed-id set per import batch, `scripts/indexing.py:214-230` — at
  * scale that set IS a bloom gate).
  */
object BloomGate {

  /** Distributed bloom build over `xxhash64(key)`. Returns the serialized
    * sketch (driver-held, like a broadcast dim): a few MB for hundreds of
    * millions of keys. Returns None for an empty keys frame (DEGENERATE:
    * nothing is blocked).
    */
  def build(keys: DataFrame, key: Column, expectedItems: Long,
            fpp: Double = 0.01): Option[Array[Byte]] = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    // optimal bits for the target false-positive rate: -n·ln(p)/ln(2)^2
    val numBits = math.max(64L,
      math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    // BloomFilterAggregate SILENTLY clamps both parameters at
    // spark.sql.optimizer.runtime.bloomFilter.{maxNumItems,maxNumBits}
    // (defaults 4M items / 2^26 bits = 8 MB) — beyond ~7M items the
    // effective fpp quietly exceeds the requested one and the confirm-join
    // arm inflates (exactness is preserved; cost is not). Raise the caps
    // for this session so an explicit build honors its requested fpp.
    val conf = keys.sparkSession.conf
    val maxItemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val maxBitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    if (conf.get(maxItemsKey).toLong < expectedItems)
      conf.set(maxItemsKey, expectedItems.toString)
    if (conf.get(maxBitsKey).toLong < numBits)
      conf.set(maxBitsKey, numBits.toString)
    val agg = ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(key)),
        Literal(expectedItems), Literal(numBits)
      ).toAggregateExpression())
    Option(keys.agg(agg.as("bloom")).head().getAs[Array[Byte]](0))
  }

  /** Codegen'd membership probe against a driver-held sketch (the bloom
    * travels as a plan literal — no join, no shuffle). */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      ColumnBridge.expression(xxhash64(key))))

  /** Exact blocklist drop: rows of `corpus` whose `key` does NOT appear in
    * `blocklist.blockKey` — identical to `corpus.join(blocklist, key ===
    * blockKey, "left_anti")`, but only the bloom-flagged sliver of the
    * corpus enters the join. `expectedItems` sizes the sketch (estimate
    * high; an undersized bloom only raises the false-positive rate, never
    * breaks exactness).
    */
  def blocklistDrop(corpus: DataFrame, key: Column,
                    blocklist: DataFrame, blockKey: Column,
                    expectedItems: Long, fpp: Double = 0.01): DataFrame =
    build(blocklist, blockKey, expectedItems, fpp) match {
      case None => corpus // empty blocklist: nothing to drop
      case Some(bloom) =>
        val flagged = mightContain(bloom, key)
        val clean = corpus.where(!flagged) // no false negatives: shuffle-free keep
        val confirmKeep = corpus.where(flagged)
          .join(blocklist.select(blockKey.as("__block_key")).distinct(),
            key === col("__block_key"), "left_anti")
        clean.unionByName(confirmKeep)
    }
}
