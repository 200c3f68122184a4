package graft

import org.apache.spark.sql.functions._

import graft.ingest.Lifecycle
import graft.search.Ann
import graft.tables.Tables

class LifecycleAnnSpec extends SparkSpec {
  import spark.implicits._

  test("deltaDetect classifies new vs changed and drops unchanged") {
    val existing = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val incoming = Seq((1L, "a"), (2L, "B"), (9L, "z")).toDF("id", "text")
    val out = Lifecycle.deltaDetect(existing, incoming, "id", Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(2L -> "changed", 9L -> "new"))
  }

  test("cleanupDeletes = left anti join on id") {
    val existing = Seq(1L, 2L, 3L).toDF("id")
    val incoming = Seq(2L).toDF("id")
    val out = Lifecycle.cleanupDeletes(existing, incoming, "id")
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 3L))
  }

  test("applyChangelog: last-writer-wins fold with insert, update, delete and absent-key delete") {
    import graft.ingest.Lifecycle
    val base = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("id", "text")
    val changes = Seq(
      (1L, 1L, "U", "one-upd"),   // superseded by the seq-2 delete below
      (1L, 2L, "D", "x"),
      (2L, 1L, "D", "x"),
      (3L, 1L, "U", "three-upd"),
      (4L, 1L, "I", "four"),      // insert of a new key
      (99L, 1L, "D", "x")         // delete of an absent key: a no-op
    ).toDF("id", "seq", "op", "text")
    val out = Lifecycle.applyChangelog(base, changes, "id", "seq", "op")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(3L -> "three-upd", 4L -> "four"), out.toString)
  }

  test("latest/history version views split an append-only table") {
    val v = Seq((1L, 1, "old"), (1L, 2, "new"), (2L, 1, "only"))
      .toDF("id", "version", "text")
    val latest = Lifecycle.latestVersions(v, "id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(latest == Set((1L, 2, "new"), (2L, 1, "only")))
    val hist = Lifecycle.historyVersions(v, "id")
      .collect().map(r => (r.getLong(0), r.getString(3))).toSet
    assert(hist == Set((1L, "1_v1")))
  }

  test("ivf with all lists probed equals brute-force top-k") {
    val emb = Tables.embeddings(spark, Sf0001)
    val centroids = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val qv = emb.where(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val ivfAll = Ann.ivfTopK(emb, centroids, qv, nprobe = 10, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val brute = graft.search.SearchEngine.denseTopK(spark, Sf0001, 0, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivfAll == brute)
  }

  test("reranked quantized ivf: exact final scores, brute-force-equal at full probe") {
    val emb = Tables.embeddings(spark, Sf0001)
    val centroids = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val qv = emb.where(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val reranked = Ann
      .ivfTopKReranked(Ann.ivfAssign(emb, centroids), centroids, qv,
        nprobe = 10, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val brute = graft.search.SearchEngine.denseTopK(spark, Sf0001, 0, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // int8 quantization decides only the 30-candidate cut; with all lists
    // probed the exact top-10 must survive it and the SCORES must be the
    // full-precision cosines, not quantized ones
    assert(reranked == brute)
  }

  test("ivf with fewer probes returns a subset of candidates, still ranked") {
    val emb = Tables.embeddings(spark, Sf0001)
    val centroids = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val qv = emb.where(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val out = Ann.ivfTopK(emb, centroids, qv, nprobe = 3, k = 10)
      .collect().map(r => r.getDouble(1)).toSeq
    assert(out.nonEmpty)
    assert(out == out.sorted.reverse) // ranked desc
  }

  test("hll sketch: approx distinct within the documented relative error of exact") {
    // x1 is rows-only in the oracle gate (sketches aren't cross-engine
    // reproducible); this pins its accuracy instead: Spark's HLL++ at the
    // default rsd=0.05 must land within a conservative 3*rsd of exact.
    val ev = Tables.events(spark, Sf0001)
    val both = ev.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("approx"),
        countDistinct(col("user_id")).as("exact"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(both.nonEmpty)
    both.foreach { case (k, approx, exact) =>
      assert(math.abs(approx - exact) <= math.max(1L, (exact * 0.15).toLong),
        s"$k: approx=$approx exact=$exact")
    }
  }

  test("approx quantile sketch: p50/p95/p99 within rank error of exact percentiles") {
    // x3 is rows-only in the oracle gate (sketch internals aren't
    // cross-engine reproducible); this bounds it instead: with accuracy
    // 1000 the rank error is ~1/1000, so against the exact per-group
    // value distribution each approximate quantile must sit within a
    // generous +-2% RANK window of its target.
    val ev = Tables.events(spark, Sf0001)
    val groups = ev.select("event_type").distinct()
      .collect().map(_.getString(0))
    for (g <- groups) {
      val vals = ev.where(col("event_type") === g)
        .select("value").collect().map(_.getDouble(0)).sorted
      val approx = ev.where(col("event_type") === g)
        .agg(approx_percentile(col("value"),
          array(lit(0.5), lit(0.95), lit(0.99)), lit(1000)))
        .collect()(0).getSeq[Double](0)
      for (((p, a), i) <- Seq(0.5, 0.95, 0.99).zip(approx).zipWithIndex) {
        val lo = vals(math.max(0, ((p - 0.02) * (vals.length - 1)).toInt))
        val hi = vals(math.min(vals.length - 1, math.ceil((p + 0.02) * (vals.length - 1)).toInt))
        assert(a >= lo && a <= hi, s"$g p$p[$i]: $a outside [$lo, $hi]")
      }
    }
  }

  test("hyperplane-lsh near-dup: identical vectors always pair at 1.0; all pairs meet the floor") {
    val emb = Tables.embeddings(spark, Sf0001)
    val planted = emb.union(emb.where(col("vec_id") === 1)
      .withColumn("vec_id", lit(99999L)))
    val pairs = Ann.lshNearDupPairs(planted, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // identical vectors share every band -> guaranteed candidate, cosine 1.0
    assert(pairs.exists(p => p._1 == 1L && p._2 == 99999L && p._3 == 1.0), pairs.toSeq)
    assert(pairs.forall(_._3 >= 0.4))
  }

  test("mllib lsh join is SOUND vs exact pairwise distance and finds planted dups (recall bound)") {
    // Turns the x2 smoke check into a real bound: approxSimilarityJoin
    // post-filters candidates by TRUE distance, so its pair set must be a
    // subset of the exact pair set at the same threshold (soundness), and
    // identical vectors always collide in every hash table, so the planted
    // clone pair is guaranteed recall at distance 0.
    val base = Tables.documents(spark, Sf0001).limit(100)
    val docs = base.union(base.where(col("doc_id") === 1)
      .withColumn("doc_id", lit(9999L)))
    val model = graft.index.MlIndex.fitEmbedder(docs, "text", 64)
    val embedded = model.transform(docs).cache()

    val feats = embedded.select("doc_id", "features").collect()
      .map(r => r.getLong(0) ->
        r.getAs[org.apache.spark.ml.linalg.Vector](1).toArray)
    val maxD = 1.0
    def dist(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val exact = (for {
      (ia, va) <- feats; (ib, vb) <- feats
      if ia < ib && dist(va, vb) <= maxD
    } yield (ia, ib)).toSet

    val ann = graft.index.MlIndex.fitAnn(embedded)
    val approx = graft.index.MlIndex.approxNearDup(ann, embedded, embedded, maxD)
      .selectExpr("datasetA.doc_id AS a", "datasetB.doc_id AS b")
      .where(col("a") < col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(approx.subsetOf(exact),
      s"unsound pairs: ${(approx -- exact).take(5)}")       // no false positives
    assert(approx.contains((1L, 9999L)))                     // planted dup found
    val recall = if (exact.isEmpty) 1.0 else approx.size.toDouble / exact.size
    info(s"lsh recall at d<=$maxD: ${approx.size}/${exact.size} = $recall")
    assert(recall >= 0.5, s"recall $recall collapsed")
  }

  test("x2 query output is self-certifying: every row carries recall >= 0.95") {
    // The driver records x2 rows-only (no DuckDB twin for LSH internals);
    // the recall column makes the artifact itself carry the quality bound
    // at sf0.01 (the driver's verify scale). 500-doc cap applies at any sf.
    val out = graft.SparkEntry.queries("x2_mllib_lsh_neardup")(
      spark, "/root/testdata/sf0.01").collect()
    assert(out.nonEmpty)
    val recall = out.head.getAs[Double]("recall")
    assert(out.forall(_.getAs[Double]("recall") == recall))
    assert(recall >= 0.95, s"measured LSH recall $recall below 0.95")
  }

  test("knn graph: cluster twins are mutual top-1 neighbors; k bounds degree; self excluded") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // two tight clusters; centroids = one member of each
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.99f, 0.05f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.05f, 0.99f))
    ).toDF("vec_id", "embedding")
    val cents = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("cid", "cvec")
    val g = graft.search.Ann.knnGraph(vecs, cents, nprobe = 1, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(g == Map(1L -> 2L, 2L -> 1L, 3L -> 4L, 4L -> 3L), g.toString)
    // degree bound and no self-edges at k=3, all lists probed
    val g3 = graft.search.Ann.knnGraph(vecs, cents, nprobe = 2, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(g3.forall { case (s, d) => s != d })
    assert(g3.groupBy(_._1).values.forall(_.length == 3))
  }

  test("knn graph with all lists probed equals the brute-force neighbor ranking") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val graph = graft.search.Ann.knnGraph(emb, cents, nprobe = 10, k = 4)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1))).toSet
    // brute force: all-pairs cosine, rank window per src
    val a = emb.select(col("vec_id").as("src"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("dst"), col("embedding").as("eb"))
    val w = Window.partitionBy(col("src"))
      .orderBy(col("score").desc, col("dst").asc)
    val brute = a.crossJoin(b).where(col("src") =!= col("dst"))
      .withColumn("score",
        round(graft.functions.VectorOps.cosineSim(col("ea"), col("eb")), 6))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= 4)
      .select(col("src"), col("rank"), col("dst"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(graph == brute && brute.nonEmpty)
  }
}
