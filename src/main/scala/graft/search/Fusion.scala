package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Result fusion (reference §2.3 J1/J2/J3):
  *  - simple fusion: union + keep-best-score + provenance concat
  *    (`/root/reference/app/services/search_service.py:301-342`)
  *  - reciprocal rank fusion, k=60
  *    (`/root/reference/scripts/indexing.py:707-774`)
  *  - linear alpha-blend with min-max normalization
  *    (`/root/reference/scripts/indexing.py:776-816`)
  *
  * All fusion inputs are top-k arms — tiny relative to the corpus — so
  * every join here is a broadcast-able join over at most a few hundred
  * rows regardless of corpus size; no full-table shuffle ever happens in
  * fusion. Tie-breaking is explicit everywhere (score desc, id asc): the
  * reference relied on Python dict insertion order, which is incidental.
  */
object Fusion {

  /** Union two arms (id, score, search_type), keep max score per id, concat
    * distinct provenance sorted ("exact+vector" like the reference's
    * `search_type = "a+b"`). */
  def simple(arms: Seq[DataFrame], idCol: String, limit: Int): DataFrame = {
    val all = arms.reduce(_ unionByName _)
    all.groupBy(col(idCol))
      .agg(
        round(max(col("score")), 6).as("score"),
        array_join(array_sort(collect_set(col("search_type"))), "+")
          .as("search_type"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(limit)
  }

  /** Rank rows of one arm 1..n by (score desc, id asc). Scores must
    * already be rounded so ranks are engine-independent. */
  def ranked(arm: DataFrame, idCol: String): DataFrame =
    arm.withColumn("rank",
      row_number().over(Window.orderBy(col("score").desc, col(idCol).asc)))

  /** RRF merge of two ranked arms: score = Σ 1/(k + rank). A missing
    * side simply contributes nothing. Merged as a UNION + hash aggregate
    * rather than a full-outer join (the [[rrfBatched]] rationale: the
    * same values — two-term FP addition is commutative — without a
    * SortMergeJoin's exchanges+sorts in a serving-latency plan). */
  def rrf(dense: DataFrame, sparse: DataFrame, idCol: String,
          k: Int = 60, limit: Int = 10): DataFrame = {
    def term(arm: DataFrame): DataFrame =
      ranked(arm, idCol)
        .select(col(idCol), (lit(1.0) / (lit(k) + col("rank"))).as("__t"))
    term(dense).unionByName(term(sparse))
      .groupBy(col(idCol))
      .agg(round(sum(col("__t")), 6).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(limit)
  }

  /** Batched RRF: [[rrf]] for N queries in one plan. Both arms carry a
    * `qidCol`; ranks, the full-outer merge, and the final top-`limit` cut
    * are all per-query (rank windows partition by qid, so Spark runs them
    * as WindowGroupLimit partial top-k — no global sort at any batch
    * size). Per-qid results are identical to running [[rrf]] per query
    * (FusionSpec pins the loop equality); the point is amortization: one
    * job, one scan per arm, for the whole query table. */
  def rrfBatched(dense: DataFrame, sparse: DataFrame, qidCol: String,
                 idCol: String, k: Int = 60, limit: Int = 10): DataFrame = {
    // The merge is a UNION + hash aggregate, not a full-outer join: RRF is
    // Σ 1/(k + rank_arm) over the arms an id appears in, so summing the
    // per-arm terms of the unioned rank tables is value-identical to the
    // coalesce-over-join form (two-term FP addition is commutative — same
    // rounding either way) while replacing a SortMergeJoin (2 exchanges +
    // 2 sorts on (qid, id)) with ONE hash-partitioned aggregate. On a
    // 2500-row post-arm table that was pure stage overhead; at cluster
    // scale it is one fewer shuffle of the merged candidate set.
    def rankTerm(arm: DataFrame): DataFrame =
      arm.withColumn("__t", lit(1.0) / (lit(k) + row_number().over(
          Window.partitionBy(col(qidCol))
            .orderBy(col("score").desc, col(idCol).asc))))
        .select(col(qidCol), col(idCol), col("__t"))
    val wFinal = Window.partitionBy(col(qidCol))
      .orderBy(col("score").desc, col(idCol).asc)
    rankTerm(dense).unionByName(rankTerm(sparse))
      .groupBy(col(qidCol), col(idCol))
      .agg(round(sum(col("__t")), 6).as("score"))
      .withColumn("__rn", row_number().over(wFinal))
      .where(col("__rn") <= limit)
      .select(col(qidCol), col(idCol), col("score"))
      .orderBy(col(qidCol).asc, col("score").desc, col(idCol).asc)
  }

  /** Min-max normalize an arm's score to [0,1]; constant arm → 1.0
    * (matches the reference's degenerate-case handling,
    * `scripts/indexing.py:826-828`). */
  def minMaxNorm(arm: DataFrame, idCol: String): DataFrame = {
    val stats = arm.agg(min(col("score")).as("lo"), max(col("score")).as("hi"))
    arm.crossJoin(broadcast(stats))
      .withColumn("score",
        when(col("hi") === col("lo"), lit(1.0))
          .otherwise((col("score") - col("lo")) / (col("hi") - col("lo"))))
      .drop("lo", "hi")
  }

  /** Z-score normalize with the reference's +0.5 shift; σ=0 → 0.5
    * (`scripts/indexing.py:830-836`). */
  def zNorm(arm: DataFrame, idCol: String): DataFrame = {
    val stats = arm.agg(
      avg(col("score")).as("mu"), stddev_pop(col("score")).as("sigma"))
    arm.crossJoin(broadcast(stats))
      .withColumn("score",
        when(col("sigma") === 0.0, lit(0.5))
          .otherwise((col("score") - col("mu")) / col("sigma") + 0.5))
      .drop("mu", "sigma")
  }

  /** Linear fusion: full-outer join on id, score = α·dense + (1-α)·sparse
    * with min-max normalization per arm first; missing side scores 0. */
  def linear(dense: DataFrame, sparse: DataFrame, idCol: String,
             alpha: Double, limit: Int): DataFrame = {
    val d = minMaxNorm(dense, idCol).select(col(idCol), col("score").as("sd"))
    val s = minMaxNorm(sparse, idCol).select(col(idCol), col("score").as("ss"))
    d.join(s, Seq(idCol), "full_outer")
      .withColumn("score", round(
        lit(alpha) * coalesce(col("sd"), lit(0.0)) +
        lit(1.0 - alpha) * coalesce(col("ss"), lit(0.0)), 6))
      .select(col(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(limit)
  }
}
