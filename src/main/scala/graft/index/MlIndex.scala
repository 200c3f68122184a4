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
