package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Approximate nearest-neighbor scale path (reference O4: Qdrant's HNSW
  * with `full_scan_threshold` fallback, `scripts/indexing.py:330-340`).
  *
  * Spark-first equivalent: IVF (inverted-file) partition pruning. Vectors
  * are assigned to their nearest centroid at index-build time; a query
  * probes only the `nprobe` nearest centroid partitions. On a cluster the
  * assignment is the partition key, so a probe reads `nprobe/k` of the
  * data — the same sublinear-scan effect as the HNSW graph, expressed as
  * partition pruning instead of a pointer walk. Below a size threshold,
  * brute force wins (Qdrant's `full_scan_threshold=50000` models the same
  * trade-off).
  */
object Ann {

  /** Assign each vector to its nearest centroid (cosine, deterministic
    * tie-break on centroid id). Centroids: (cid, cvec). */
  def ivfAssign(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = vectors.crossJoin(broadcast(centroids))
      .withColumn("cscore", round(VectorOps.cosineSim(col("embedding"), col("cvec")), 6))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cscore").desc, col("cid").asc)
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("cid"), col("embedding"))
  }

  /** IVF top-k over a PRECOMPUTED assignment (the index-build/query split:
    * `ivfAssign` runs once at build time and is persisted partitioned by
    * `cid`; each query then reads only the `nprobe` probed lists). */
  def ivfTopKAssigned(assigned: DataFrame, centroids: DataFrame,
                      queryVec: DataFrame, nprobe: Int, k: Int): DataFrame = {
    val probes = centroids.crossJoin(broadcast(queryVec))
      .withColumn("qscore", round(VectorOps.cosineSim(col("cvec"), col("qvec")), 6))
      .orderBy(col("qscore").desc, col("cid").asc)
      .limit(nprobe)
      .select(col("cid"))

    assigned
      .join(broadcast(probes), Seq("cid")) // partition pruning: only probed lists
      .crossJoin(broadcast(queryVec))
      .select(col("vec_id").as("id"),
        round(VectorOps.cosineSim(col("embedding"), col("qvec")), 6).as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }

  /** IVF + int8 scoring composed — the full scale stack for a RAM-resident
    * corpus: partition pruning reads nprobe/k of the lists AND each vector
    * is scored from its 4×-smaller quantized codes (the scale cancels in
    * cosine, so the int math is exact — `VectorOps.cosineSimInt8`). At
    * 100 TB this is what fits the hot set in executor memory. */
  def ivfTopKQuantized(assigned: DataFrame, centroids: DataFrame,
                       queryVec: DataFrame, nprobe: Int, k: Int): DataFrame = {
    val probes = centroids.crossJoin(broadcast(queryVec))
      .withColumn("qscore", round(VectorOps.cosineSim(col("cvec"), col("qvec")), 6))
      .orderBy(col("qscore").desc, col("cid").asc)
      .limit(nprobe)
      .select(col("cid"))
    val qq = queryVec.select(
      VectorOps.quantizeInt8(col("qvec")).getField("q").as("qq"))
    assigned
      .join(broadcast(probes), Seq("cid"))
      .crossJoin(broadcast(qq))
      .select(col("vec_id").as("id"),
        round(VectorOps.cosineSimInt8(
          VectorOps.quantizeInt8(col("embedding")).getField("q"),
          col("qq")), 6).as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }

  /** IVF + int8 candidates + EXACT re-rank — the full production serving
    * stack: probe nprobe lists, score candidates from the 4×-smaller
    * quantized codes, keep `k · oversample` by quantized score, then
    * re-rank just those with full-precision cosine. Quantization error
    * can only cost recall at the CANDIDATE cut (mitigated by
    * oversampling), never wrong final scores — the returned scores are
    * exact. Both cuts order by (rounded score, id), so the result is
    * deterministic and oracle-reproducible. */
  def ivfTopKReranked(assigned: DataFrame, centroids: DataFrame,
                      queryVec: DataFrame, nprobe: Int, k: Int,
                      oversample: Int = 3): DataFrame = {
    val probes = centroids.crossJoin(broadcast(queryVec))
      .withColumn("qscore", round(VectorOps.cosineSim(col("cvec"), col("qvec")), 6))
      .orderBy(col("qscore").desc, col("cid").asc)
      .limit(nprobe)
      .select(col("cid"))
    val qboth = queryVec.select(col("qvec"),
      VectorOps.quantizeInt8(col("qvec")).getField("q").as("qq"))
    val cand = assigned
      .join(broadcast(probes), Seq("cid"))
      .crossJoin(broadcast(qboth))
      .select(col("vec_id"), col("embedding"), col("qvec"),
        round(VectorOps.cosineSimInt8(
          VectorOps.quantizeInt8(col("embedding")).getField("q"),
          col("qq")), 6).as("iscore"))
      .orderBy(col("iscore").desc, col("vec_id").asc)
      .limit(k * oversample)
    cand.select(col("vec_id").as("id"),
      round(VectorOps.cosineSim(col("embedding"), col("qvec")), 6).as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }

  /** Batched multi-query IVF ANN — the serving-at-scale shape. One plan
    * answers a whole TABLE of queries: per-query probe lists come from a
    * (queries × centroids) broadcast ranking, the probed (qid, cid, qvec)
    * set — Q·nprobe rows — broadcasts into a single pass over the
    * assignment, and the per-query top-k is a rank window that Spark's
    * WindowGroupLimit pushes partial (each list partition emits at most k
    * rows per query before the shuffle).
    *
    * Why this matters at 100 TB: the reference serves queries one at a
    * time against a RAM-resident graph (`app/services/search_service
    * .py:120-180`); on a cluster the fixed per-job cost (scheduling, scan
    * setup) dominates single-query latency, so throughput serving batches
    * Q queries into ONE job — the assignment is still read once (and only
    * the union of probed lists of it), not Q times.
    *
    * queries: (qid, qvec). Output: (qid, id, score), ≤ k rows per qid,
    * scores rounded to 6dp for cross-engine determinism. */
  def ivfTopKBatched(assigned: DataFrame, centroids: DataFrame,
                     queries: DataFrame, nprobe: Int, k: Int,
                     ordered: Boolean = true): DataFrame = {
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("qscore").desc, col("cid").asc)
    val probed = queries.crossJoin(broadcast(centroids))
      .withColumn("qscore", round(VectorOps.cosineSim(col("cvec"), col("qvec")), 6))
      .withColumn("rn", row_number().over(wProbe))
      .where(col("rn") <= nprobe)
      .select(col("qid"), col("cid"), col("qvec"))

    val wTopK = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("id").asc)
    val topk = assigned
      .join(broadcast(probed), Seq("cid")) // one pass; only probed lists
      .select(col("qid"), col("vec_id").as("id"),
        round(VectorOps.cosineSim(col("embedding"), col("qvec")), 6).as("score"))
      .withColumn("rn", row_number().over(wTopK))
      .where(col("rn") <= k)
      .select(col("qid"), col("id"), col("score"))
    // ordered=false for fusion callers: the trailing global sort is a
    // RANGE exchange (plus its boundary-sampling job) that destroys the
    // qid hash partitioning the downstream rank windows want — the fused
    // plan re-orders at the end anyway.
    if (ordered) topk.orderBy(col("qid").asc, col("score").desc, col("id").asc)
    else topk
  }

  /** Convenience form that assigns inline — for tests/oracles; production
    * queries should pass a persisted assignment to [[ivfTopKAssigned]],
    * otherwise every query pays the O(N·k) assignment cost it is supposed
    * to avoid. */
  def ivfTopK(vectors: DataFrame, centroids: DataFrame, queryVec: DataFrame,
              nprobe: Int, k: Int): DataFrame =
    ivfTopKAssigned(ivfAssign(vectors, centroids), centroids, queryVec, nprobe, k)

  /** Recall@k as a function of nprobe — the ANN quality dial, certified
    * in ONE plan. Every candidate is tagged with the PROBE RANK of its
    * list (the nprobe at which that list first gets probed), so each
    * curve point is just a rank filter `prank <= nprobe` + partial top-k
    * (WindowGroupLimit keyed by nprobe — the same amortized shape as the
    * batched serving plans, legs sharing one scan). Ground truth needs
    * no external oracle: the exact top-k is the unfiltered candidate
    * top-k (every vector lives in exactly one list), so an nprobe equal
    * to the centroid count must print recall 1.0 — the curve certifies
    * itself. Output: (nprobe, hits, recall), one row per requested
    * nprobe. */
  def recallCurve(vectors: DataFrame, centroids: DataFrame,
                  queryVec: DataFrame, nprobes: Seq[Int], k: Int): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val assigned = ivfAssign(vectors, centroids)
    val pr = centroids.crossJoin(broadcast(queryVec))
      .select(col("cid"),
        round(VectorOps.cosineSim(col("cvec"), col("qvec")), 6).as("qscore"))
      .withColumn("prank", row_number().over(
        Window.orderBy(col("qscore").desc, col("cid").asc)))
      .select(col("cid"), col("prank"))
    val cand = assigned.join(broadcast(pr), Seq("cid"))
      .crossJoin(broadcast(queryVec))
      .select(col("vec_id").as("id"), col("prank"),
        round(VectorOps.cosineSim(col("embedding"), col("qvec")), 6).as("score"))
    val exactTop = cand
      .orderBy(col("score").desc, col("id").asc).limit(k)
      .select(col("id"))
    val legs = nprobes.toDF("nprobe")
    val wLeg = Window.partitionBy(col("nprobe"))
      .orderBy(col("score").desc, col("id").asc)
    val hits = cand.join(broadcast(legs), col("prank") <= col("nprobe"))
      .withColumn("rn", row_number().over(wLeg))
      .where(col("rn") <= k)
      .join(broadcast(exactTop), Seq("id"), "left_semi")
      .groupBy(col("nprobe")).agg(count(lit(1)).as("hits"))
    legs.join(hits, Seq("nprobe"), "left")
      .select(col("nprobe"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        round(coalesce(col("hits"), lit(0L)).cast("double") / k, 6).as("recall"))
      .orderBy(col("nprobe"))
  }

  /** Hyperplane-LSH embedding near-dup pairs: the 64 sign bits of each
    * vector (random-hyperplane signature — `VectorOps.binarySignature32`)
    * are cut into 8 bands of 8 bits; vectors sharing ANY band become
    * candidates (equi-join on the band bucket, never all-pairs), then an
    * exact cosine confirm keeps pairs >= threshold. The embedding-space
    * twin of `Dedup.simhashPairs`: candidate cost scales with bucket
    * occupancy, confirm cost with candidates — both vanishing fractions
    * of N² at scale. Embeddings travel inside the bucket payload, so the
    * scan pipeline is consumed exactly once (no join-backs). */
  def lshNearDupPairs(vectors: DataFrame, threshold: Double): DataFrame = {
    val sigs = vectors.select(
      struct(col("vec_id").as("id"), col("embedding").as("emb")).as("m"),
      VectorOps.binarySignature32(col("embedding"), 0).as("sig_lo"),
      VectorOps.binarySignature32(col("embedding"), 32).as("sig_hi"))
    val bandStructs = (0 until 8).map { b =>
      val word = if (b < 4) col("sig_lo") else col("sig_hi")
      struct(lit(b).as("band_id"),
        shiftright(word, (b % 4) * 8).bitwiseAND(lit(255L)).as("band"))
    }
    val bands = sigs
      .select(col("m"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("m"), col("bb.band_id").as("band_id"), col("bb.band").as("band"))
    // Same degenerate-bucket guard as Dedup's LSH operators — and MORE
    // load-bearing here, since each bucket member carries its full
    // embedding: one hot band over a near-dup-heavy corpus would
    // otherwise build an O(M) array of vectors in a single agg row.
    // Truncation is observable via the same metric pattern.
    bands
      .groupBy(col("band_id"), col("band"))
      .agg(array_sort(collect_list(col("m"))).as("all_ms"))
      .observe(s"${graft.dedup.Dedup.BucketStatsMetric}_emb",
        sum(when(size(col("all_ms")) > graft.dedup.Dedup.MaxBucketSize, 1L)
          .otherwise(0L)).as("truncated_buckets"),
        max(size(col("all_ms"))).as("max_bucket_size"))
      .select(slice(col("all_ms"), 1, graft.dedup.Dedup.MaxBucketSize).as("ms"))
      .where(size(col("ms")) > 1)
      .select(explode(col("ms")).as("a"), col("ms"))
      .select(col("a"), explode(col("ms")).as("b"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(VectorOps.cosineSim(col("a.emb"), col("b.emb")), 6).as("score"))
      .distinct()
      .where(col("score") >= threshold)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Blocked exact top-1 neighbor join: for each vector, its single nearest
    * neighbor within a blocking column (embedding-cosine near-dup
    * candidate generation — blocking bounds the pair count, the classic
    * alternative when no similarity threshold is known a priori). */
  def nearestWithinBlock(vectors: DataFrame, blockCol: String): DataFrame = {
    val a = vectors.select(col(blockCol), col("vec_id").as("id_a"),
      col("embedding").as("emb_a"))
    val b = vectors.select(col(blockCol), col("vec_id").as("id_b"),
      col("embedding").as("emb_b"))
    val pairs = a.join(b, Seq(blockCol))
      .where(col("id_a") =!= col("id_b"))
      .withColumn("score", round(VectorOps.cosineSim(col("emb_a"), col("emb_b")), 6))
    val w = Window.partitionBy(col("id_a"))
      .orderBy(col("score").desc, col("id_b").asc)
    pairs.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("id_a"), col("id_b"), col("score"))
      .orderBy(col("id_a"))
  }

  /** Approximate kNN GRAPH: every vector's top-k neighbors, candidates
    * blocked by IVF probe lists — the input artifact for graph-based
    * corpus work (SemDeDup clustering, diversity analysis, label
    * propagation). The all-queries generalization of [[ivfTopKBatched]]
    * with the one scale-critical difference: the query side IS the
    * corpus, so nothing broadcasts — probes ride a SHUFFLE equi-join on
    * the probed centroid id. Cost: corpus×nprobe rows through one
    * hash-partitioned join against centroid-bucketed lists, then a
    * per-vector partial top-k (WindowGroupLimit) before the qid shuffle.
    * Candidate fan-out per vector = the probed lists' sizes, bounded by
    * k-means list balance — never N². Recall follows IVF recall at the
    * same nprobe; raise nprobe for denser graphs. */
  def knnGraph(vectors: DataFrame, centroids: DataFrame,
               nprobe: Int, k: Int): DataFrame = {
    val assigned = ivfAssign(vectors, centroids)
    val wProbe = Window.partitionBy(col("src"))
      .orderBy(col("pscore").desc, col("cid").asc)
    val probes = vectors.crossJoin(broadcast(centroids))
      .select(col("vec_id").as("src"), col("embedding").as("qvec"), col("cid"),
        round(VectorOps.cosineSim(col("embedding"), col("cvec")), 6).as("pscore"))
      .withColumn("rn", row_number().over(wProbe))
      .where(col("rn") <= nprobe)
      .select(col("src"), col("qvec"), col("cid"))
    val wTopK = Window.partitionBy(col("src"))
      .orderBy(col("score").desc, col("dst").asc)
    probes.join(assigned, Seq("cid")) // shuffle join: both sides corpus-sized
      .where(col("vec_id") =!= col("src"))
      .select(col("src"), col("vec_id").as("dst"),
        round(VectorOps.cosineSim(col("embedding"), col("qvec")), 6).as("score"))
      .withColumn("rank", row_number().over(wTopK))
      .where(col("rank") <= k)
      .orderBy(col("src"), col("rank"))
  }

  /** (vec_id, s, sub): the `m` contiguous `subDim`-dim subvectors of each
    * vector — the slicing shared by the PQ build and query paths. The
    * slice array is generated and consumed inside one Generate, so it
    * materializes once per row. */
  private def pqSubvectors(vectors: DataFrame, m: Int, subDim: Int): DataFrame =
    vectors.select(col("vec_id"),
      posexplode(expr(
        s"transform(sequence(0, ${m - 1}), s -> slice(embedding, s * $subDim + 1, $subDim))")))
      .toDF("vec_id", "s", "sub")

  /** Product-quantization codebooks: per subspace `s`, the `k` codewords
    * are the subvector slices of the first `k` stored vectors — the same
    * fixed-vector determinism device as the a1/a4 IVF centroids, so an
    * external oracle can reproduce the codebooks with no engine-private
    * state. A production build swaps in per-subspace trained kmeans (the
    * `IvfIndex.buildTrained` pattern); everything downstream is
    * unchanged. Output: (s, cid, cw). */
  def pqCodebooks(vectors: DataFrame, m: Int, subDim: Int, k: Int): DataFrame =
    pqSubvectors(vectors.where(col("vec_id") < k), m, subDim)
      .select(col("s"), col("vec_id").as("cid"), col("sub").as("cw"))

  /** PQ encoding: each (vector, subspace) takes the L2-nearest codeword.
    * Distances use the dot identity ‖a−b‖² = a·a − 2a·b + b·b over the
    * codegen [[VectorOps.dot]] (each float promoted to double before
    * multiplying, sequential accumulation — the cross-engine-exact form;
    * elementwise float32 subtraction would NOT reproduce in a double
    * engine), rounded 6dp before the argmin so tie-breaks are
    * engine-independent. At scale this runs once at build time and
    * persists: `m · log2(k)` bits per vector — 4 bytes here vs 256 for
    * the raw floats. Output: (vec_id, s, cid). */
  def pqAssign(vectors: DataFrame, codebooks: DataFrame,
               m: Int, subDim: Int): DataFrame = {
    val scored = pqSubvectors(vectors, m, subDim)
      .join(broadcast(codebooks), Seq("s"))
      .withColumn("dist2", round(
        VectorOps.dot(col("sub"), col("sub"))
          - lit(2.0) * VectorOps.dot(col("sub"), col("cw"))
          + VectorOps.dot(col("cw"), col("cw")), 6))
    val w = Window.partitionBy("vec_id", "s")
      .orderBy(col("dist2").asc, col("cid").asc)
    scored.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select("vec_id", "s", "cid")
  }

  /** PQ-ADC search with exact re-rank: build the per-query lookup table
    * (codeword · query-subvector — `m·k` dots, broadcast), score every
    * encoded vector as the ordered-fold sum of its codewords' LUT entries
    * (asymmetric distance computation), keep `k · oversample` candidates
    * by approximate score, then re-rank just those with full-precision
    * cosine. Like [[ivfTopKReranked]], quantization error can only cost
    * recall at the candidate cut — returned scores are exact. The ADC sum
    * folds in subspace order, so the approximate scores (and hence the
    * candidate set) are engine-reproducible. */
  def pqTopKReranked(vectors: DataFrame, codebooks: DataFrame,
                     queryVec: DataFrame, m: Int, subDim: Int, k: Int,
                     oversample: Int = 3): DataFrame = {
    val assigned = pqAssign(vectors, codebooks, m, subDim)
    val qsubs = pqSubvectors(
      queryVec.select(lit(0L).as("vec_id"), col("qvec").as("embedding")),
      m, subDim)
      .select(col("s"), col("sub").as("qs"))
    val lut = codebooks.join(broadcast(qsubs), Seq("s"))
      .select(col("s"), col("cid"),
        round(VectorOps.dot(col("cw"), col("qs")), 6).as("lut"))
    val approx = assigned.join(broadcast(lut), Seq("s", "cid"))
      .groupBy("vec_id")
      .agg(expr("round(aggregate(array_sort(collect_list(struct(s, lut))), " +
        "cast(0 as double), (a, x) -> a + x.lut), 6)").as("approx"))
    val cand = approx
      .orderBy(col("approx").desc, col("vec_id").asc)
      .limit(k * oversample)
      .select("vec_id")
    vectors.join(broadcast(cand), Seq("vec_id"))
      .crossJoin(broadcast(queryVec))
      .select(col("vec_id").as("id"),
        round(VectorOps.cosineSim(col("embedding"), col("qvec")), 6).as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }

  /** SemDeDup (Abbas et al. 2023): semantic dedup with the pairwise
    * comparison bounded by embedding clusters. Vectors assign to their
    * nearest centroid ([[ivfAssign]]); cosine pairs are computed only
    * WITHIN a cluster; a vector is dropped when a lower-id cluster-mate
    * sits at `>= tau` similarity. The cluster join is an equi-join on
    * `cid` — the quadratic term is (cluster size)², never N², which is
    * exactly the paper's scalability argument; at 100 TB the centroid
    * count is chosen so lists fit an executor.
    *
    * Output: (vec_id, cid, kept) for every input vector — callers
    * anti-join their corpus on `kept = false` to apply it.
    */
  def semDedup(vectors: DataFrame, centroids: DataFrame,
               tau: Double): DataFrame = {
    val asg = ivfAssign(vectors, centroids)
    val dropped = asg.select(col("cid"), col("vec_id").as("ia"), col("embedding").as("ea"))
      .join(asg.select(col("cid"), col("vec_id").as("ib"), col("embedding").as("eb")),
        Seq("cid"))
      .where(col("ia") < col("ib") &&
        round(VectorOps.cosineSim(col("ea"), col("eb")), 6) >= tau)
      .select(col("ib").as("vec_id"))
      .distinct()
    asg.select("vec_id", "cid")
      .join(dropped.withColumn("hit", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"), col("hit").isNull.as("kept"))
  }

  /** Maximal Marginal Relevance diversity re-rank (Carbonell & Goldstein
    * 1998): greedily select `k` of the top-`m` candidates, each step
    * maximizing `λ·rel(q,d) − (1−λ)·max_{s∈S} sim(d,s)` — relevance
    * traded against redundancy with what is already selected, the
    * standard answer to "my top-10 is ten copies of the same passage".
    *
    * Determinism contract: candidate relevances and pairwise sims round
    * to 6dp IN SPARK (the same `VectorOps.cosineSim` + round the s1/a1
    * oracles pin), the MMR objective to 9dp, ties break on id ascending
    * — so a SQL engine replaying the greedy loop (recursive CTE) lands
    * on the identical selection. `1−λ` is derived in decimal arithmetic
    * so it equals the SQL literal (IEEE `1.0 - 0.7` is NOT `0.3`).
    *
    * Scale shape: everything corpus-sized is distributed (the top-m arm
    * is TakeOrdered); the greedy loop itself runs on the DRIVER over the
    * bounded m-candidate set — m rels + m·m/2 rounded sims collected,
    * k·m comparisons. That is the same bounded-head driver traffic as
    * any top-k re-rank; there is nothing distributed left to do once
    * only m≈tens of rows remain.
    */
  /** Hard bound on mmrRerank's candidate-head size: the driver collects
    * m rels + m²/2 pairwise sims, so an unchecked m=100k request would
    * pull 5·10⁹ sims onto the driver. 2048 caps that at ~2M sims (tens of
    * MB) while being an order of magnitude past any sensible diversity
    * head (reference-style re-ranks use m ≈ 3–10×k ≈ tens). */
  val MaxMmrCandidates = 2048

  def mmrRerank(vectors: DataFrame, queryVec: DataFrame, m: Int, k: Int,
                lambda: Double): DataFrame = {
    require(m <= MaxMmrCandidates,
      s"mmrRerank m=$m exceeds MaxMmrCandidates=$MaxMmrCandidates " +
        "(the driver holds m^2/2 pairwise sims; widen the distributed " +
        "top-m arm instead of the driver head)")
    val spark = vectors.sparkSession
    val mu = (BigDecimal(1) - BigDecimal(lambda)).toDouble
    val cand = vectors.crossJoin(broadcast(queryVec))
      .select(col("vec_id").cast("long").as("id"),
        round(VectorOps.cosineSim(col("embedding"), col("qvec")), 6).as("rel"),
        col("embedding"))
      .orderBy(col("rel").desc, col("id").asc)
      .limit(m)
      .localCheckpoint() // two consumers (rel head + pair matrix), m rows
    val rels = cand.select(col("id"), col("rel")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    val simRows = cand.select(col("id").as("id_a"), col("embedding").as("va"))
      .crossJoin(cand.select(col("id").as("id_b"), col("embedding").as("vb")))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(VectorOps.cosineSim(col("va"), col("vb")), 6).as("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    def sim(a: Long, b: Long): Double = if (a < b) simRows((a, b)) else simRows((b, a))
    def round9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

    val remaining = scala.collection.mutable.LinkedHashMap(rels: _*)
    val picked = scala.collection.mutable.ArrayBuffer[(Int, Long, Double)]()
    while (picked.size < math.min(k, rels.length)) {
      val chosen = picked.map(_._2)
      var bestId = -1L
      var bestScore = Double.NegativeInfinity
      remaining.foreach { case (id, rel) =>
        val pen = if (chosen.isEmpty) 0.0 else chosen.map(s => sim(id, s)).max
        val score = round9(lambda * rel - mu * pen)
        if (score > bestScore || (score == bestScore && id < bestId)) {
          bestId = id; bestScore = score
        }
      }
      picked += ((picked.size + 1, bestId, bestScore))
      remaining.remove(bestId)
    }
    import spark.implicits._
    picked.toSeq.toDF("mmr_rank", "id", "mmr_score")
  }

  /** Greedy beam search over a prebuilt kNN edge list — the HNSW layer-0
    * search pattern (the reference's actual serving structure: Qdrant
    * answers queries by walking its neighbor graph from fixed entry
    * points, `scripts/indexing.py:326-340` builds it) re-expressed as ONE
    * declarative plan: the hop loop is UNROLLED at plan-build time, so
    * there is no driver-side iteration state and the whole search is a
    * fixed chain of joins + ordered heads that Catalyst sees end-to-end.
    *
    * Per hop: the current beam head (top-`beam` candidates so far) joins
    * the edge list for its out-neighbors, the new ids are scored against
    * the query (one broadcast of the 1-row query vector), and the
    * candidate set unions + dedups. After `hops` rounds the answer is the
    * candidate top-k. Deterministic by construction: candidate SETS are
    * order-free, every head/final cut is (score desc, id asc), and scores
    * are rounded to 6 dp — so the unrolled plan is replayable in SQL as
    * `hops` chained CTEs (the a23 oracle does exactly that).
    *
    * Scale shape: each hop touches beam·k edge rows (an equi-join into
    * the artifact, prunable by src) and scores ≤ beam·k new vectors —
    * independent of corpus size, which is the entire point of graph ANN:
    * the corpus-sized work happened once, in the graph build
    * ([[knnGraph]] / [[graft.index.IncrementalKnn]]).
    *
    * edges: (src, dst); vectors: (vec_id, embedding); queryVec: 1-row
    * (qvec); entries: (id) fixed entry points. Output (id, score), k
    * rows. Recall depends on graph degree/hops like any HNSW-family
    * search; certify with [[recallCurve]]-style exact comparison. */
  def graphTopK(edges: DataFrame, vectors: DataFrame, queryVec: DataFrame,
                entries: DataFrame, beam: Int, hops: Int, k: Int): DataFrame = {
    def scored(ids: DataFrame): DataFrame =
      ids.join(vectors.select(col("vec_id").as("id"), col("embedding")), Seq("id"))
        .crossJoin(broadcast(queryVec))
        .select(col("id"),
          round(VectorOps.cosineSim(col("embedding"), col("qvec")), 6).as("score"))
    val adj = edges.select(col("src"), col("dst"))
    // The candidate set is bounded by construction (≤ |entries| +
    // hops·beam·k rows — tens, never corpus-sized), so the walk state
    // lives on ONE partition: repartition(1) collapses each hop's
    // union to a single-partition exchange, and dropDuplicates runs
    // exchange-free on top of it (SinglePartition satisfies any
    // clustered distribution). The EDGE join stays distributed — the
    // tiny frontier broadcasts into the artifact scan.
    var cand = scored(entries).repartition(1)
    for (_ <- 0 until hops) {
      val frontier = cand.orderBy(col("score").desc, col("id").asc).limit(beam)
      val neighbors = frontier.select(col("id").as("src"))
        .join(adj, Seq("src"))
        .select(col("dst").as("id")).distinct()
      cand = cand.unionByName(scored(neighbors))
        .repartition(1).dropDuplicates("id")
    }
    cand.orderBy(col("score").desc, col("id").asc).limit(k)
  }

  /** Hierarchical entry-point selection for [[graphTopK]] — the HNSW
    * upper-layer analogue (reference: Qdrant's HNSW descends coarse
    * layers to pick where the layer-0 walk starts,
    * `scripts/indexing.py:326-340` configures the layered build). A
    * recursive layer hierarchy is imperative by nature; the declarative
    * two-level form is a COARSE LAYER = deterministic 1/`sampleMod`
    * subset of the stored vectors (`vec_id % sampleMod = 0` — stable
    * across appends, no stored layer assignment needed), brute-force
    * scored against the query, top-`e` becoming the walk's entry
    * points. Same compromise IVF makes for its centroid scan, but over
    * actual graph nodes, so the walk STARTS in the query's
    * neighborhood instead of at fixed seeds — fewer hops reach the
    * true top-k (a24 runs hops=2 where fixed-seed a23 needs 3).
    *
    * Scale shape: the coarse scan reads 1/sampleMod of the vectors
    * (one pruned scan + broadcast of the 1-row query, partial top-e —
    * no shuffle of the corpus); pick sampleMod so the layer is a few
    * million rows at 100 TB, exactly like sizing an IVF centroid set.
    * Output: (id), `e` rows, ready to pass as `entries`. */
  def hierEntries(vectors: DataFrame, queryVec: DataFrame,
                  sampleMod: Int, e: Int): DataFrame =
    hierEntriesFrom(
      vectors.where(pmod(col("vec_id"), lit(sampleMod)) === lit(0)),
      queryVec, e)

  /** [[hierEntries]] when the coarse layer is already materialized — a
    * PREBUILT mod-subset artifact ([[graft.index.TfIdfGraphIndex]]
    * persists one at build time). The pmod filter cannot prune parquet
    * row groups (no min/max relation), so the inline form READS the
    * whole vectors table and filters 15/16 of it away per query; a
    * persisted coarse layer makes entry selection 1/sampleMod of the
    * corpus as I/O, which at 100 TB is the difference between the
    * walk's only corpus-sized term and a 6% scan. Semantics unchanged:
    * same rows, same (score desc, id asc) top-e. */
  def hierEntriesFrom(coarse: DataFrame, queryVec: DataFrame,
                      e: Int): DataFrame =
    coarse
      .crossJoin(broadcast(queryVec))
      .select(col("vec_id").as("id"),
        round(VectorOps.cosineSim(col("embedding"), col("qvec")), 6).as("score"))
      .orderBy(col("score").desc, col("id").asc).limit(e)
      .select(col("id"))

  /** [[hierEntries]] for a query TABLE — one coarse scan answers every
    * query's entry selection (queries broadcast into the pruned sampled
    * scan, per-qid partial top-e window). Output (qid, id). */
  def hierEntriesBatched(vectors: DataFrame, queries: DataFrame,
                         sampleMod: Int, e: Int): DataFrame =
    hierEntriesBatchedFrom(
      vectors.where(pmod(col("vec_id"), lit(sampleMod)) === lit(0)),
      queries, e)

  /** [[hierEntriesBatched]] over a prebuilt coarse layer (see
    * [[hierEntriesFrom]] for why the artifact beats the inline filter). */
  def hierEntriesBatchedFrom(coarse: DataFrame, queries: DataFrame,
                             e: Int): DataFrame = {
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("id").asc)
    coarse
      .crossJoin(broadcast(queries))
      .select(col("qid"), col("vec_id").as("id"),
        round(VectorOps.cosineSim(col("embedding"), col("qvec")), 6).as("score"))
      .withColumn("rn", row_number().over(w)).where(col("rn") <= e)
      .select(col("qid"), col("id"))
  }

  /** [[graphTopK]] for a query TABLE — N walks in ONE plan, the
    * throughput-serving form of graph ANN (the a12/s3d/s4b batched
    * pattern applied to the walk: per-request Spark-job overhead
    * amortizes over the batch, which is how a graph-ANN server actually
    * runs). State carries qid: the candidate set is (qid, id, score),
    * every beam/final cut is a per-qid partial rank window, and each
    * hop's neighbor expansion joins the SHARED edge artifact once for
    * all queries. The combined state is ≤ |queries|·(entries +
    * hops·beam·k) rows — still tiny — so it stays single-partition
    * (exchange-free unions/windows, per [[graphTopK]]); the edge join
    * stays distributed with the frontier broadcasting into the
    * artifact scan.
    *
    * edges: (src, dst); vectors: (vec_id, embedding); queries:
    * (qid, qvec) — small, broadcast; entries: (qid, id) per-query entry
    * points (from [[hierEntriesBatched]] or fixed seeds). Output
    * (qid, id, score), ≤ k rows per qid. */
  def graphTopKBatched(edges: DataFrame, vectors: DataFrame,
                       queries: DataFrame, entries: DataFrame,
                       beam: Int, hops: Int, k: Int): DataFrame = {
    def scored(ids: DataFrame): DataFrame =
      ids.join(vectors.select(col("vec_id").as("id"), col("embedding")), Seq("id"))
        .join(broadcast(queries), Seq("qid"))
        .select(col("qid"), col("id"),
          round(VectorOps.cosineSim(col("embedding"), col("qvec")), 6).as("score"))
    val adj = edges.select(col("src"), col("dst"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("id").asc)
    var cand = scored(entries).repartition(1)
    for (_ <- 0 until hops) {
      val frontier = cand.withColumn("rn", row_number().over(w))
        .where(col("rn") <= beam).select(col("qid"), col("id"))
      val neighbors = frontier.select(col("qid"), col("id").as("src"))
        .join(adj, Seq("src"))
        .select(col("qid"), col("dst").as("id")).distinct()
      cand = cand.unionByName(scored(neighbors))
        .repartition(1).dropDuplicates("qid", "id")
    }
    cand.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .select(col("qid"), col("id"), col("score"))
      .orderBy(col("qid").asc, col("score").desc, col("id").asc)
  }

  /** [[graphTopK]] as POINT LOOKUPS — the low-latency serving form.
    *
    * The one-plan walk ([[graphTopK]]) keeps everything declarative, but
    * its per-hop joins are broadcast-of-frontier into FULL scans of the
    * edge artifact and the vectors table: flat at test scale, linear in
    * the corpus at 100 TB (hops × two corpus scans per query). A graph-ANN
    * server does neither — each hop is a handful of adjacency-list and
    * vector lookups. This variant is that server path: the walk state
    * (≤ |entries| + hops·beam·k ids — tens) lives on the driver, and each
    * hop issues two LITERAL `IN`-predicate reads — `src IN (frontier)`
    * against the src-sorted edge artifact
    * ([[graft.index.KnnGraphIndex]]) and `vec_id IN (new ids)` against
    * the vectors parquet. Both push to the parquet scan (PushedFilters,
    * pinned by IndexSpec) where sorted row-group min/max stats skip
    * everything outside the requested ranges: per-hop I/O is O(beam·k)
    * row groups regardless of corpus size. The driver-side state is the
    * same documented bounded-head pattern as MMR (hard-capped working
    * set; here it is ≤ a few hundred ids by construction).
    *
    * Candidate-set semantics are identical to [[graphTopK]] (union by id,
    * every cut (score desc, id asc), scores rounded to 6 dp), so results
    * are value-identical — the a27 oracle is a24's unchanged. Trade-off
    * vs the one-plan form: `2·hops + 1` tiny jobs per query (latency
    * floor-bound, like every serving-class query here) instead of one
    * large job with corpus-sized scans; for throughput serving batch with
    * [[graphTopKBatched]], for per-query latency at big corpora seek. */
  /** [[graphTopKSeek]] for a BATCH of queries — the throughput form of
    * the seek path, and (r14) the serving default behind
    * `SearchEngine.graphSearchBatched`. The one-plan
    * [[graphTopKBatched]] amortizes its per-hop joins over the batch,
    * but those joins SCAN the full vectors and edge artifacts every hop
    * — measured ×2.76 per-query at ×10 corpus (BENCHNOTES r14 slope
    * leg) because the scan term grows with the corpus while the batch
    * stays fixed. This variant keeps the walk state on the driver —
    * bounded by batch × (entries + hops · beam · degree) ids, a few
    * thousand rows, the same documented bounded-head pattern as
    * [[graphTopKSeek]]/MMR — and pays per hop ONE `src IN (batch
    * frontier)` point-seek against the src-sorted edge artifact plus
    * ONE `vec_id IN (fresh ids)` point-seek against the vectors: per-hop
    * I/O is O(batch · beam · degree) row groups at ANY corpus size.
    * 2·hops+1 tiny jobs per BATCH (not per query).
    *
    * Candidate-set semantics are IDENTICAL to [[graphTopKBatched]]
    * (per-qid union by id, every cut (score desc, id asc), scores
    * rounded to 6 dp before any ordering), so per-qid results are
    * value-identical — IndexSpec pins the equality, and the batch route
    * keeps its ≡-single-query contract. Entry selection stays on the
    * coarse-layer scan (corpus/CoarseMod rows, amortized over the
    * batch) — the one remaining corpus-proportional term, configuration
    * like an HNSW top layer. */
  /** Driver-side (score desc, id asc) with Spark SQL's double ordering
    * semantics — NaN sorts as the LARGEST value (so FIRST on desc, where
    * Scala's total order on a negated key puts it last) and -0.0 == 0.0
    * (where negation would order them) — so the seek walks' driver-sorted
    * beam/k cuts stay row-identical to the declarative walks'
    * `col("score").desc, col("id").asc` cuts even on degenerate
    * (zero-norm → NaN) scores (r14 ADVICE). `java.lang.Double.compare`
    * already places NaN above +Inf; only -0.0 needs normalizing. */
  private def cmpScoreDescIdAsc(sa: Double, ia: Long,
                                sb: Double, ib: Long): Int = {
    val na = if (sa == 0.0) 0.0 else sa
    val nb = if (sb == 0.0) 0.0 else sb
    val c = java.lang.Double.compare(nb, na)
    if (c != 0) c else java.lang.Long.compare(ia, ib)
  }
  private[graft] val idScoreDescIdAsc: Ordering[(Long, Double)] =
    (a, b) => cmpScoreDescIdAsc(a._2, a._1, b._2, b._1)
  private val qidAscScoreDescIdAsc: Ordering[(Long, Long, Double)] =
    (a, b) => {
      val c = java.lang.Long.compare(a._1, b._1)
      if (c != 0) c else cmpScoreDescIdAsc(a._3, a._2, b._3, b._2)
    }

  def graphTopKSeekBatched(edges: DataFrame, vectors: DataFrame,
                           queries: DataFrame, entries: DataFrame,
                           beam: Int, hops: Int, k: Int): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    // qid -> (id -> score); overwrites are idempotent (same rounded
    // score for the same pair), matching the batched dedup
    val cand = scala.collection.mutable.Map
      .empty[Long, scala.collection.mutable.Map[Long, Double]]
    def scoreInto(pairs: Seq[(Long, Long)]): Unit = if (pairs.nonEmpty) {
      val ids = pairs.map(_._2).distinct
      vectors.where(col("vec_id").isin(ids: _*))
        .select(col("vec_id").as("id"), col("embedding"))
        .join(broadcast(pairs.toDF("qid", "id")), Seq("id"))
        .join(broadcast(queries), Seq("qid"))
        .select(col("qid"), col("id"),
          round(VectorOps.cosineSim(col("embedding"), col("qvec")), 6)
            .as("score"))
        .collect()
        .foreach(r => cand.getOrElseUpdate(r.getLong(0),
          scala.collection.mutable.Map.empty)
          .update(r.getLong(1), r.getDouble(2)))
    }
    scoreInto(entries.select(col("qid"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq)
    for (_ <- 0 until hops) {
      val frontier = cand.toSeq.flatMap { case (qid, m) =>
        m.toSeq.sorted(idScoreDescIdAsc).take(beam)
          .map { case (id, _) => (qid, id) }
      }
      if (frontier.nonEmpty) {
        val srcIds = frontier.map(_._2).distinct
        val bySrc = edges.where(col("src").isin(srcIds: _*))
          .select(col("src"), col("dst")).collect()
          .map(r => (r.getLong(0), r.getLong(1)))
          .groupBy(_._1)
        val fresh = frontier.flatMap { case (qid, src) =>
          bySrc.getOrElse(src, Array.empty[(Long, Long)])
            .map { case (_, dst) => (qid, dst) }
        }.distinct.filterNot { case (qid, id) =>
          cand.get(qid).exists(_.contains(id))
        }
        scoreInto(fresh)
      }
    }
    cand.toSeq.flatMap { case (qid, m) =>
      m.toSeq.sorted(idScoreDescIdAsc).take(k)
        .map { case (id, s) => (qid, id, s) }
    }.sorted(qidAscScoreDescIdAsc)
      .toDF("qid", "id", "score")
  }

  def graphTopKSeek(edges: DataFrame, vectors: DataFrame, queryVec: DataFrame,
                    entryIds: Seq[Long], beam: Int, hops: Int, k: Int): DataFrame = {
    val spark = vectors.sparkSession
    def scoreIds(ids: Seq[Long]): Seq[(Long, Double)] =
      vectors.where(col("vec_id").isin(ids: _*))
        .crossJoin(broadcast(queryVec))
        .select(col("vec_id"),
          round(VectorOps.cosineSim(col("embedding"), col("qvec")), 6))
        .collect().toSeq.map(r => (r.getLong(0), r.getDouble(1)))
    val cand = scala.collection.mutable.Map.empty[Long, Double]
    cand ++= scoreIds(entryIds)
    for (_ <- 0 until hops) {
      val frontier = cand.toSeq
        .sorted(idScoreDescIdAsc).take(beam).map(_._1)
      val fresh = edges.where(col("src").isin(frontier: _*))
        .select(col("dst")).distinct()
        .collect().map(_.getLong(0)).toSeq
        .filterNot(cand.contains)
      if (fresh.nonEmpty) cand ++= scoreIds(fresh)
    }
    import spark.implicits._
    cand.toSeq.sorted(idScoreDescIdAsc).take(k)
      .toDF("id", "score")
  }
}
