package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Retrieval-quality evaluation — recall@k, MRR@k, nDCG@k per query.
  *
  * The measurement harness every retrieval engine needs next to its
  * serving path. The reference only eyeballs this — its offline harness
  * replays a fixed query list and prints the top-5 ids/scores for manual
  * inspection (`scripts/parallel_search_fusion.py:275-302`); here the
  * replay is formalized into the standard rank metrics, and the whole
  * evaluation is ONE distributed plan: the run under test is a
  * batched exact top-k (every query answered in a single pass over the
  * corpus — `Ann.ivfTopKBatched`'s exact sibling), relevance is joined
  * on, and the three metrics reduce per query. Nothing is collected to
  * the driver; at 100 TB the eval scales exactly like the batched
  * serving path it certifies.
  *
  * Ground truth here is label agreement: a retrieved vector is relevant
  * to its query iff it carries the query's `label` (the embeddings
  * table's classification column) — the standard proxy when no
  * hand-judged qrels exist. Definitions (binary gains, ranks start
  * at 1, the query vector itself is excluded from the candidate set):
  *
  *   recall@k = |relevant in top-k| / min(R, k)      R = corpus-wide
  *              relevant count for the query's label (excluding self)
  *   MRR@k    = 1 / rank of the first relevant hit   (0 if none)
  *   nDCG@k   = DCG@k / IDCG@k,
  *              DCG = Σ rel_i / log2(i+1),  IDCG = Σ_{i=1..min(R,k)} 1/log2(i+1)
  *
  * Every metric is rounded to 6dp, ordering is total (qid), and each
  * step is a DuckDB-expressible relational form — the t34 oracle replays
  * the whole computation in SQL.
  */
object RetrievalEval {

  /** Per-query metrics of exact cosine top-k retrieval over `emb`
    * (vec_id, embedding, label), with the query set `queries`
    * (qid, qvec, qlabel) broadcast into one corpus pass. Output:
    * (qid, n_rel, recall_at_k, mrr_at_k, ndcg_at_k) ordered by qid. */
  def labelEval(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    // corpus-wide relevant count per label (tiny: |labels| rows); renamed
    // so the join back onto the same-lineage scan stays unambiguous
    val labelCounts = emb.groupBy(col("label")).agg(count(lit(1)).as("n_label"))
      .select(col("label").as("lbl"), col("n_label"))

    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("vec_id").asc)
    val topk = emb
      .crossJoin(broadcast(queries))
      .where(col("vec_id") =!= col("qid")) // self never counts
      .select(col("qid"), col("qlabel"), col("vec_id"), col("label"),
        round(VectorOps.cosineSim(col("embedding"), col("qvec")), 6).as("score"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)

    // R = relevant count excluding the query itself (the query carries
    // its own label, so subtract 1)
    val withR = topk
      .join(broadcast(labelCounts), col("qlabel") === col("lbl"), "left")
      .withColumn("n_rel", coalesce(col("n_label"), lit(0L)) - 1)
      .withColumn("rel", (col("qlabel") === col("label")).cast("int"))

    withR
      .groupBy(col("qid"), col("n_rel"))
      .agg(
        sum(col("rel")).as("hits"),
        min(when(col("rel") === 1, col("rank"))).as("first_rel"),
        sum(col("rel").cast("double") / log2(col("rank") + 1)).as("dcg"))
      .withColumn("ideal_n", least(col("n_rel"), lit(k.toLong)))
      // guard: sequence(1, 0) would auto-step DOWN to [1, 0], not empty
      .withColumn("idcg",
        when(col("ideal_n") > 0,
          aggregate(sequence(lit(1L), col("ideal_n")), lit(0.0),
            (acc, i) => acc + lit(1.0) / log2(i.cast("double") + 1)))
          .otherwise(lit(0.0)))
      .select(
        col("qid"),
        col("n_rel"),
        round(when(col("ideal_n") > 0,
          col("hits").cast("double") / col("ideal_n")).otherwise(0.0), 6)
          .as("recall_at_k"),
        round(coalesce(lit(1.0) / col("first_rel"), lit(0.0)), 6).as("mrr_at_k"),
        round(when(col("idcg") > 0, col("dcg") / col("idcg")).otherwise(0.0), 6)
          .as("ndcg_at_k"))
      .orderBy(col("qid"))
  }
}
