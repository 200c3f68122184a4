package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Near-dup-leakage-safe split: route each document by the hash of its
    * dedup CLUSTER, not of the document itself. A plain per-key [[split]]
    * leaks evaluation data through near-duplicates — a held-out document's
    * 99%-similar twin lands in train and the model has effectively seen
    * the test set (the C4/GPT-3 style contamination both d-series dedup
    * and t10's eval-set scan exist to stop). Here every member of a
    * connected near-dup component shares its keeper's hash bucket, so a
    * cluster can never straddle sides, on any run, on any engine.
    *
    * `pairs` is any near-dup pair set (simhash d6, minhash d3, embedding
    * d8 — or their union); docs in no pair split by their own id. Adds a
    * `side` column ('train' | 'heldout'); the cluster map is
    * component-count-sized, a vanishing fraction of the corpus, and the
    * single join is the only cost on top of [[split]].
    */
  def clusterSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
                       aCol: String, bCol: String, heldOutBps: Int): DataFrame = {
    val cc = graft.dedup.Dedup.connectedComponents(pairs, aCol, bCol)
      .select(col("id").as(idCol), col("keeper"))
    df.join(cc, Seq(idCol), "left")
      .withColumn("side",
        when(hashBucket(coalesce(col("keeper"), col(idCol)).cast("string"))
          < heldOutBps, lit("heldout")).otherwise(lit("train")))
      .drop("keeper")
  }

  /** Per-group row cap (RefinedWeb/C4-style per-DOMAIN caps): keep the
    * top `cap` rows of each group by `orderCol` DESC, ties broken by
    * `idCol` ASC — fully deterministic, so the kept set is reproducible
    * across runs and engines.
    *
    * Skew design: web corpora have power-law domains — one hot domain
    * can hold 1%+ of the corpus, and a single `row_number` window over
    * `groupCol` would funnel all of it through ONE task. Phase 1 salts
    * each group into `salts` shards by row-id hash and takes the local
    * top-`cap` per shard (parallel across the cluster); only the
    * ≤ salts·cap survivors per group reach the phase-2 exact window.
    * The result is IDENTICAL to the naive single-window form — any row
    * in the global top-cap is necessarily in the top-cap of its own
    * shard — but the heavy pass is skew-free and the exact pass sees
    * O(salts·cap) rows per group regardless of group size.
    */
  def capPerGroup(df: DataFrame, groupCol: String, orderCol: String,
                  idCol: String, cap: Int, salts: Int = 8): DataFrame = {
    val shard = pmod(HashOps.tokenHash32(col(idCol).cast("string")), lit(salts.toLong))
    val local = Window.partitionBy(col(groupCol), shard)
      .orderBy(col(orderCol).desc, col(idCol).asc)
    val exact = Window.partitionBy(col(groupCol))
      .orderBy(col(orderCol).desc, col(idCol).asc)
    df.withColumn("__rl", row_number().over(local))
      .where(col("__rl") <= cap)
      .withColumn("__rg", row_number().over(exact))
      .where(col("__rg") <= cap)
      .drop("__rl", "__rg")
  }

  /** Systematic PPS (probability-proportional-to-size) sampling, per
    * stratum: select `n` positions per stratum by walking the cumulative
    * weight line and picking every row whose weight interval covers a
    * multiple of `total/n` — big documents are proportionally more likely
    * to be hit, which is exactly the size-bias a token-budgeted training
    * mix wants (sampling DOCUMENTS uniformly under-weights long ones).
    *
    * Entirely INTEGER arithmetic: row selected iff
    * `floor(cum·n / total) > floor((cum−w)·n / total)` with bigint
    * division — no float thresholds, so the selected set is bit-identical
    * on any engine (the `HashOps` determinism discipline). Rows are walked
    * in `idCol` order; a fixed universe gives a fixed sample, and adding a
    * shard of new ids changes only selections after the insertion point.
    *
    * Shape: two windows per stratum (running sum + stratum total), both
    * partitioned by `strataCol` — parallel across strata, no global
    * window. A single 100 TB stratum would swap the running sum for the
    * standard two-phase form (per-partition partials + broadcast offsets);
    * the selection rule is unchanged since it only needs (cum, w, total).
    *
    * Weights must be positive integers (token counts, byte sizes).
    * Output: input rows that were selected, with their `__pick` multiple
    * dropped. A row wider than `total/n` can cover several multiples but
    * is emitted once.
    */
  def ppsSystematic(df: DataFrame, strataCol: String, weightCol: String,
                    idCol: String, n: Int): DataFrame = {
    val byStratum = Window.partitionBy(col(strataCol)).orderBy(col(idCol))
    val whole = Window.partitionBy(col(strataCol))
    // greatest(total, 1): an all-zero-weight stratum has cum = 0 everywhere
    // so nothing selects regardless of the divisor — but ANSI mode would
    // otherwise throw on the div-by-zero before reaching that conclusion
    df.withColumn("__w", col(weightCol).cast("long"))
      .withColumn("__cum", sum(col("__w")).over(byStratum))
      .withColumn("__total", greatest(sum(col("__w")).over(whole), lit(1L)))
      // DECIMAL(38,0) multiply: with byte-size weights a 100 TB corpus has
      // cum ~ 1e14, and cum * n overflows int64 once n reaches ~92k —
      // silent wraparound (non-ANSI) or a throw (ANSI). long × int is at
      // most ~2e28, which decimal(38,0) holds exactly, and `div` on
      // decimals is exact integral division, so selection is unchanged
      // everywhere int64 was already correct.
      .where(expr(s"(CAST(__cum AS DECIMAL(38,0)) * ${n}L) div __total") >
             expr(s"(CAST(__cum - __w AS DECIMAL(38,0)) * ${n}L) div __total"))
      .drop("__w", "__cum", "__total")
  }

  /** Deterministic token-budget prefix: the rows whose cumulative
    * `weightCol` (token counts, byte sizes) stays within `budget` when
    * the corpus is walked in hash order — "give me a reproducible
    * ~1B-token subset" (the fixed-budget slice every training run starts
    * from). Same rows on every run and engine; never overshoots.
    *
    * Scale shape: the naive form is ONE global running-sum window — a
    * single-task bottleneck at any real size. Here the walk order is
    * (hash bucket, hash, id), which lets the prefix split into
    *  - a per-bucket weight aggregate (`buckets` rows, map-side
    *    combined) cumulated on the DRIVER — bounded by `buckets`,
    *    never by the corpus;
    *  - full buckets below the crossing point kept by a scan-side
    *    predicate (zero shuffle, zero window);
    *  - ONE within-bucket window over the single crossing bucket —
    *    ~1/`buckets` of the corpus, the only ordered work.
    * The result is row-identical to the naive global window.
    */
  def budgetPrefix(df: DataFrame, idCol: String, weightCol: String,
                   budget: Long, buckets: Int = 1024): DataFrame = {
    require(budget >= 0 && buckets > 0)
    val h = HashOps.tokenHash32(col(idCol).cast("string"))
    val keyed = df.withColumn("__h", h)
      .withColumn("__b", pmod(col("__h"), lit(buckets.toLong)))
    val perBucket = keyed.groupBy(col("__b"))
      .agg(sum(col(weightCol).cast("long")).as("__w"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // driver-side cumulative over <= `buckets` tiny rows: find the first
    // bucket whose running total crosses the budget
    var before = 0L
    var cut = -1L
    perBucket.foreach { case (b, w) =>
      if (cut < 0) { if (before + w > budget) cut = b else before += w }
    }
    val out =
      if (cut < 0) keyed // whole corpus fits the budget
      else {
        val full = keyed.where(col("__b") < cut)
        val partial = keyed.where(col("__b") === cut)
          .withColumn("__cum", sum(col(weightCol).cast("long"))
            .over(Window.orderBy(col("__h"), col(idCol))))
          .where(col("__cum") <= budget - before)
        full.unionByName(partial.drop("__cum"))
      }
    out.drop("__h", "__b")
  }

  /** Domain-mixture resampling: realize a target mixture of integer
    * weights (e.g. en:2, de:1, fr:1 — "two en documents for every de and
    * fr") at the MAXIMUM volume the corpus supports. The batch count is
    * `T = min_d floor(n_d / w_d)` over the spec'd domains; each domain
    * keeps exactly `w_d · T` rows, elected deterministically by id-hash
    * order, so the mix is exact by construction and reproducible across
    * runs and engines. Domains absent from `weights` are dropped
    * (allowlist semantics, like [[hashSampleBy]]).
    *
    * Scale shape: one map-side-combined count per domain (collected —
    * |spec| rows, bounded by the mixture spec, never the corpus), quotas
    * rejoined as a literal when-chain (no join), then the [[capPerGroup]]
    * salted two-phase election with a per-domain cap — skew-free even
    * when one domain holds 1% of a 100 TB corpus. `T = 0` (some spec'd
    * domain can't fill one batch) yields the empty mix rather than a
    * silently wrong ratio.
    */
  def mixToTarget(df: DataFrame, idCol: String, domainCol: String,
                  weights: Map[String, Int], salts: Int = 8): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0))
    val domains = weights.keys.toSeq
    val counts = df.where(col(domainCol).isin(domains: _*))
      .groupBy(col(domainCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val t = weights.map { case (s, w) => counts.getOrElse(s, 0L) / w }.min
    val quotaCol = weights.foldLeft(lit(0L)) { case (acc, (s, w)) =>
      when(col(domainCol) === s, lit(w * t)).otherwise(acc)
    }
    val h = HashOps.tokenHash32(col(idCol).cast("string"))
    val shard = pmod(h, lit(salts.toLong))
    val local = Window.partitionBy(col(domainCol), shard)
      .orderBy(h.asc, col(idCol).asc)
    val exact = Window.partitionBy(col(domainCol))
      .orderBy(h.asc, col(idCol).asc)
    df.where(col(domainCol).isin(domains: _*))
      .withColumn("__q", quotaCol)
      .withColumn("__rl", row_number().over(local))
      .where(col("__rl") <= col("__q"))
      .withColumn("__rg", row_number().over(exact))
      .where(col("__rg") <= col("__q"))
      .drop("__q", "__rl", "__rg")
  }

  /** Seeded deterministic global shuffle + shard assignment — the final
    * step of a training-data pipeline: examples land in `nShards` output
    * shards in pseudorandom order, reproducibly (same seed → bit-identical
    * sharding on any engine; new seed → fresh permutation). The shuffle
    * key is the md5-derived [[HashOps.stableId]] of `seed:id`, so order is
    * data-independent and re-runs are stable — no `rand()`, which Spark
    * re-evaluates per task attempt and no oracle can reproduce.
    *
    * Output: (id, shard, pos) — shard = key mod `nShards`, pos = the
    * example's ordinal within its shard in key order.
    *
    * Scale shape: EXACTLY a shuffle write — hash-partition on shard +
    * sort within partitions (the window partitions by shard, so Spark
    * plans one exchange and a per-partition sort; no global ordering
    * anywhere). A writer materializes the same plan as
    * `repartition(nShards, shard).sortWithinPartitions(key)` — this
    * query form exists so the assignment itself is oracle-checkable.
    */
  def seededShard(df: DataFrame, idCol: String, seed: String,
                  nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val key = HashOps.stableId(concat_ws(":", lit(seed), col(idCol)))
    df.select(col(idCol), key.as("__k"))
      .withColumn("shard", pmod(col("__k"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", (row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("__k"), col(idCol)))
        - 1).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    * each row draws `u ∈ (0,1]` from its key hash and scores
    * `key = u^(1/w)`; the n largest keys are exactly a weight-
    * proportional sample without replacement. One scan + one top-n —
    * no sequential draws, no rejection loop, and the hash-derived `u`
    * makes the "random" sample a pure function of (key, weight):
    * reproducible across runs, engines, and partitionings (the same
    * determinism discipline as every sampler here). The complement of
    * [[ppsSystematic]]: PPS controls inclusion probability per
    * SYSTEMATIC pass; A-ES draws an exact-size random subset.
    *
    * Keys are rounded to 12dp before ranking (pow may differ by an ulp
    * across math libraries), ties broken by the id — a total,
    * engine-independent order. Weights must be positive: a zero or
    * negative weight would make `1/w` infinite or negative and the key
    * NaN/Infinity — which Spark sorts ABOVE every real key, so bad-weight
    * rows would silently dominate the sample. Enforced row-wise with
    * `assert_true` (fails the job loudly) rather than a silent filter. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val w = col(weightCol).cast("double")
    val u = (HashOps.tokenHash32(col(idCol)) + 1).cast("double") / 4294967296.0
    df.withColumn("es_key",
        when(assert_true(w > 0.0,
          concat(lit(s"weightedSample: non-positive weight in '$weightCol': "),
            col(weightCol).cast("string"))).isNull,
          round(pow(u, lit(1.0) / w), 12)))
      .orderBy(col("es_key").desc, col(idCol))
      .limit(n)
  }
}
