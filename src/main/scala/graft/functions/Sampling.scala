package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling for training-data pipelines.
  *
  * RNG sampling (`df.sample`) is irreproducible across runs, partitions
  * and engines — useless for auditable dataset construction. Hash
  * sampling decides per ROW from a stable key: `md5(key) mod 10000 <
  * rate` — the same rows are selected on every run, on any engine, and
  * the decision is a pushable scan-side predicate (no shuffle, no state).
  * The same mechanism gives leakage-free train/validation SPLITS: bucket
  * by key hash, route disjoint hash ranges to each side, so a document
  * can never cross sides even across pipeline re-runs or re-shards.
  */
object Sampling {

  /** Basis-point bucket in [0, 10000) from the row key — md5-derived, so
    * identical in any engine (`HashOps` discipline). */
  def hashBucket(key: Column): Column =
    pmod(HashOps.tokenHash32(key), lit(10000L))

  /** Keep ~`bps`/10000 of rows, decided per row by the key hash. */
  def hashSample(df: DataFrame, keyCol: String, bps: Int): DataFrame =
    df.where(hashBucket(col(keyCol)) < bps)

  /** Stratified variant: per-stratum rates (basis points); strata missing
    * from the map are dropped (explicit-allowlist semantics, like
    * training-mix specs). */
  def hashSampleBy(df: DataFrame, keyCol: String, strataCol: String,
                   bpsByStratum: Map[String, Int]): DataFrame = {
    val rate = bpsByStratum.foldLeft(lit(0)) { case (acc, (s, bps)) =>
      when(col(strataCol) === s, lit(bps)).otherwise(acc)
    }
    df.where(hashBucket(col(keyCol)) < rate)
  }

  /** Leakage-free split: (train, held-out) on disjoint hash ranges —
    * `heldOutBps` basis points go to the second side. */
  def split(df: DataFrame, keyCol: String, heldOutBps: Int): (DataFrame, DataFrame) = {
    val b = hashBucket(col(keyCol))
    (df.where(b >= heldOutBps), df.where(b < heldOutBps))
  }
}
