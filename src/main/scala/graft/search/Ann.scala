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

  /** Convenience form that assigns inline — for tests/oracles; production
    * queries should pass a persisted assignment to [[ivfTopKAssigned]],
    * otherwise every query pays the O(N·k) assignment cost it is supposed
    * to avoid. */
  def ivfTopK(vectors: DataFrame, centroids: DataFrame, queryVec: DataFrame,
              nprobe: Int, k: Int): DataFrame =
    ivfTopKAssigned(ivfAssign(vectors, centroids), centroids, queryVec, nprobe, k)

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
}
