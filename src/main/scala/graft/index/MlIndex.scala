package graft.index

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, BucketedRandomProjectionLSHModel, HashingTF, IDF, Normalizer, RegexTokenizer}
import org.apache.spark.sql.DataFrame

/** MLlib batch index build (reference §3.3: the offline indexing job that
  * embeds passages and builds the ANN structure — `scripts/indexing.py`
  * `run()`; HNSW build params at `:326-340`).
  *
  * The fit/transform split mirrors the reference's two passes: `fit` is
  * the corpus-statistics pass (IDF ≈ training the embedder), `transform`
  * is the embed pass, and the LSH model is the ANN index (Qdrant's HNSW
  * analog — MLlib's `BucketedRandomProjectionLSH` over l2-normalized
  * vectors, where euclidean ordering matches cosine ordering).
  *
  * This is the scale path for *semantic quality* work (Word2Vec/real
  * models slot in here); the oracle-checkable deterministic path is
  * [[TfIdfEmbedder]].
  */
object MlIndex {

  /** Tokenize → HashingTF(dim) → IDF → L2 normalize, producing `features`. */
  def buildEmbedderPipeline(textCol: String, dim: Int): Pipeline = {
    val tok = new RegexTokenizer()
      .setInputCol(textCol).setOutputCol("__words")
      .setPattern("\\s+")
    val tf = new HashingTF()
      .setInputCol("__words").setOutputCol("__tf").setNumFeatures(dim)
    val idf = new IDF().setInputCol("__tf").setOutputCol("__tfidf")
    val norm = new Normalizer()
      .setInputCol("__tfidf").setOutputCol("features").setP(2.0)
    new Pipeline().setStages(Array(tok, tf, idf, norm))
  }

  /** Fit the embedder on the corpus (the "index build" corpus pass). */
  def fitEmbedder(docs: DataFrame, textCol: String, dim: Int = 64): PipelineModel =
    buildEmbedderPipeline(textCol, dim).fit(docs)

  /** Fit the ANN structure over embedded vectors (the "HNSW build"). */
  def fitAnn(embedded: DataFrame, numHashTables: Int = 4,
             bucketLength: Double = 0.5): BucketedRandomProjectionLSHModel =
    new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("__hashes")
      .setNumHashTables(numHashTables).setBucketLength(bucketLength)
      .fit(embedded)

  /** Approximate near-dup similarity join over two embedded sets
    * (the 100 TB near-dup path: candidates meet only inside LSH buckets). */
  def approxNearDup(ann: BucketedRandomProjectionLSHModel,
                    a: DataFrame, b: DataFrame, maxDistance: Double): DataFrame =
    ann.approxSimilarityJoin(a, b, maxDistance, "dist").toDF()

  /** [[approxNearDup]]'s SELF-join, restructured for the engine
    * (guide §2.3/§8 shape, r15): MLlib's `approxSimilarityJoin` shuffles
    * the full row struct — text, tf-idf, features, hash vectors — through
    * its candidate `distinct()`, then scores with a row-at-a-time UDF.
    * Here candidates dedup on (id_a, id_b) ALONE (the ids determine the
    * rows), features re-attach after the dedup, and the distance is the
    * codegen'd [[graft.functions.VectorOps.l2Dist]] — bit-identical to
    * MLlib's `sqrt(Vectors.sqdist)` (same ascending-index accumulation).
    * Pair set is identical by construction: same model, same `transform`
    * hashes, same (table-index, hash-value) bucket equi-join, same strict
    * `dist < maxDistance` post-filter; only `id_a < id_b` ordered pairs
    * are produced (the only ones x2 keeps). MlIndexFastJoinSpec pins
    * equality against MLlib's own join.
    *
    * Returns (id_a, id_b, dist), order unspecified. */
  def approxNearDupSelf(ann: BucketedRandomProjectionLSHModel,
                        embedded: DataFrame, idCol: String,
                        maxDistance: Double): DataFrame = {
    import org.apache.spark.sql.functions._
    val hashed = ann.transform(embedded)
    // one row per (doc, hash table): the BRP hash entry is a 1-element
    // vector; its scalar is the bucket id the MLlib join keys on
    val ex = hashed
      .select(col(idCol).as("id"),
        posexplode(col("__hashes")).as(Seq("entry", "hv")))
      .select(col("id"), col("entry"),
        org.apache.spark.ml.functions.vector_to_array(col("hv"))
          .getItem(0).as("hv0"))
    val cand = ex.select(col("id").as("id_a"), col("entry"), col("hv0"))
      .join(ex.select(col("id").as("id_b"), col("entry"), col("hv0")),
        Seq("entry", "hv0"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    val feats = hashed.select(col(idCol).as("id"),
      org.apache.spark.ml.functions.vector_to_array(col("features")).as("f"))
    cand
      .join(feats.select(col("id").as("id_a"), col("f").as("fa")), Seq("id_a"))
      .join(feats.select(col("id").as("id_b"), col("f").as("fb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.VectorOps.l2Dist(col("fa"), col("fb")).as("dist"))
      .where(col("dist") < maxDistance)
  }

  /** IVF centroid training: k-means over the embedded vectors (the proper
    * index-build for `graft.search.Ann` — the oracle-checked queries use
    * fixed stored vectors as centroids for determinism; a real deployment
    * trains them here, fixed seed for reproducibility). */
  def fitIvfCentroids(embedded: DataFrame, k: Int, seed: Long = 42L)
      : org.apache.spark.ml.clustering.KMeansModel =
    new org.apache.spark.ml.clustering.KMeans()
      .setK(k).setSeed(seed).setFeaturesCol("features")
      .fit(embedded)
}
