package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.ingest.Lifecycle
import graft.search.{Bm25, Fusion}

class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  test("bm25 with no matching terms returns an empty frame, not an error") {
    val docs = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    assert(Bm25.score(docs, "doc_id", "text", Seq("zzz")).count() == 0)
  }

  test("rrf with one empty arm degrades to the other arm's ranking") {
    val dense = Seq((1L, 0.9), (2L, 0.8)).toDF("id", "score")
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], dense.schema)
    val out = Fusion.rrf(dense, empty, "id", 60, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L))
    assert(out.head._2 == math.rint(1.0 / 61 * 1e6) / 1e6)
  }

  test("fusion of all-empty arms is empty; linear fusion too") {
    val empty = Seq.empty[(Long, Double)].toDF("id", "score")
    assert(Fusion.linear(empty, empty, "id", 0.7, 10).count() == 0)
    val emptyTyped = Seq.empty[(Long, Double, String)]
      .toDF("id", "score", "search_type")
    assert(Fusion.simple(Seq(emptyTyped, emptyTyped), "id", 10).count() == 0)
  }

  test("dedup on single-token and empty-ish docs: no shingles, no pairs, no crash") {
    val docs = Seq((1L, "one", "en"), (2L, "a b", "en"), (3L, " ", "en"))
      .toDF("doc_id", "text", "lang")
    assert(Dedup.ngramJaccard(docs, "doc_id", "text", "lang", 3, 0.1).count() == 0)
    assert(Dedup.minhashLsh(docs, "doc_id", "text", 3, 0.1).count() == 0)
    // simhash still hashes the tokens that exist
    assert(Dedup.simhash(docs, "doc_id", "text").count() == 2)
  }

  test("deltaDetect with identical inputs emits nothing") {
    val d = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
    assert(Lifecycle.deltaDetect(d, d, "id", Seq("text")).count() == 0)
  }

  test("json export: fixed key order, cap honored, single-file mode") {
    val dir = Files.createTempDirectory("graft-export").toString
    val docs = Seq((2L, "b", 20L), (1L, "a", 10L), (3L, "c", 30L))
      .toDF("doc_id", "text", "n_chars")
    Lifecycle.exportJson(docs, Seq("doc_id", "text"), "doc_id", 2,
      s"$dir/out", singleFile = true)
    val files = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.endsWith(".json"))
    assert(files.length == 1) // coalesce(1): the reference's one-file export
    val lines = scala.io.Source.fromFile(files.head).getLines().toSeq
    assert(lines == Seq("""{"doc_id":1,"text":"a"}""", """{"doc_id":2,"text":"b"}"""))
  }

  test("duplicatedNgrams on short/empty docs: below-n docs absent, singleton corpus all-unique") {
    val docs = Seq((1L, "one two"), (2L, ""), (3L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val out = Dedup.duplicatedNgrams(docs, "doc_id", "text", 3, 0.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // docs 1 (2 tokens) and 2 (0 tokens) have no trigrams -> absent;
    // doc 3's grams exist nowhere else -> dup_frac 0
    assert(out == Map(3L -> 0.0), out.toString)
  }

  test("capPerGroup with cap larger than every group keeps everything") {
    import graft.functions.Sampling
    val df = Seq((1L, "a", 5L), (2L, "a", 3L), (3L, "b", 9L)).toDF("id", "grp", "v")
    assert(Sampling.capPerGroup(df, "grp", "v", "id", cap = 10).count() == 3)
  }

  test("seededShard: stable under re-run, permuted by seed, dense positions") {
    import graft.functions.Sampling
    val df = (1L to 40L).map(i => Tuple1(i)).toDF("id")
    val a = Sampling.seededShard(df, "id", "s1", 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val b = Sampling.seededShard(df, "id", "s1", 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(a == b) // deterministic
    val c = Sampling.seededShard(df, "id", "s2", 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(a != c) // a new seed is a new permutation
    assert(a.map(_._1).sorted == (1L to 40L)) // nothing lost or duplicated
    a.groupBy(_._2).foreach { case (_, rows) => // dense per-shard ordinals
      assert(rows.map(_._3).sorted == (0L until rows.length)) }
    // single shard: pos is a total order over all rows
    val one = Sampling.seededShard(df, "id", "s1", 1).collect()
    assert(one.map(_.getLong(2)).sorted.toSeq == (0L until 40L))
  }

  test("vocabOovRates with vocab larger than the corpus vocabulary: zero OOV everywhere") {
    val docs = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = graft.functions.CorpusStats.vocabOovRates(docs, vocabSize = 100)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out == Map(1L -> 0.0, 2L -> 0.0), out.toString)
  }

  test("applyChangelog with an empty changelog returns the base unchanged") {
    import org.apache.spark.sql.functions.col
    val base = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
    val empty = Seq.empty[(Long, Long, String, String)].toDF("id", "seq", "op", "text")
    val out = graft.ingest.Lifecycle.applyChangelog(base, empty, "id", "seq", "op")
      .orderBy(col("id")).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "a"), (2L, "b")))
  }

  test("boilerplateStrip: empty corpus yields nothing; singleton corpus keeps all chunks") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.dedup.Dedup.boilerplateStrip(empty, 4, 2).count() == 0)
    val one = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val r = graft.dedup.Dedup.boilerplateStrip(one, 4, 2).collect().head
    assert(r.getLong(1) == 2 && r.getLong(2) == 0 && r.getString(3) == "a b c d e f")
  }

  test("batched ANN with an empty query table is empty, not an error") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")
    val centroids = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val noQueries = emb.where(col("vec_id") < 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val out = graft.search.Ann.ivfTopKBatched(
      graft.search.Ann.ivfAssign(emb, centroids), centroids, noQueries, 3, 5)
    assert(out.count() == 0)
  }

  test("graphTopK: hop-bounded reachability — graph walk finds only what edges reach") {
    // 2-d vectors on the unit circle; query = (1, 0) so cosine == cos(θ)
    // and the score order is fully controlled by the angle.
    def v(deg: Double): Array[Float] = {
      val r = math.toRadians(deg)
      Array(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    // entry 0 (60°) → 1 (40°) → 2 (20°) → 3 (5°): node 3 is 3 hops out.
    // node 4 (1°) is the GLOBAL best but has no in-edges — a graph walk
    // must never surface it; node 5 (80°) is a worse neighbor of 0.
    val vectors = Seq(
      (0L, v(60)), (1L, v(40)), (2L, v(20)), (3L, v(5)),
      (4L, v(1)), (5L, v(80))).toDF("vec_id", "embedding")
    val edges = Seq((0L, 1L), (0L, 5L), (1L, 2L), (2L, 3L))
      .toDF("src", "dst")
    val qv = Seq(Tuple1(v(0))).toDF("qvec")
    val entries = Seq(0L).toDF("id")

    def ids(hops: Int): Seq[Long] = graft.search.Ann
      .graphTopK(edges, vectors, qv, entries, beam = 2, hops = hops, k = 10)
      .collect().map(_.getLong(0)).toSeq

    val h3 = ids(3)
    assert(h3.head == 3L, s"3-hop walk must reach node 3 first: $h3")
    assert(!h3.contains(4L), s"unreachable global best leaked in: $h3")
    assert(h3.contains(5L)) // 1-hop neighbor retained in the candidate set
    // with only 2 hops, node 3 is beyond the frontier
    val h2 = ids(2)
    assert(!h2.contains(3L) && h2.head == 2L, s"2-hop: $h2")
    // scores are the rounded cosines (engine-grade determinism)
    val top = graft.search.Ann
      .graphTopK(edges, vectors, qv, entries, beam = 2, hops = 3, k = 1)
      .head()
    assert(math.abs(top.getDouble(1) - math.cos(math.toRadians(5))) < 1e-6)
  }

  test("hierEntries: coarse layer picks the sampled nodes nearest the query; walk benefits") {
    def v(deg: Double): Array[Float] = {
      val r = math.toRadians(deg)
      Array(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    // sampled layer (id % 4 == 0): ids 0 (90°), 4 (10°), 8 (170°).
    // query = (1,0): nearest sampled is 4, then 0, then 8.
    val vectors = Seq(
      (0L, v(90)), (1L, v(40)), (2L, v(20)), (3L, v(5)),
      (4L, v(10)), (5L, v(80)), (8L, v(170))).toDF("vec_id", "embedding")
    val qv = Seq(Tuple1(v(0))).toDF("qvec")
    val ents = graft.search.Ann.hierEntries(vectors, qv, 4, 2)
      .collect().map(_.getLong(0)).toSeq
    assert(ents == Seq(4L, 0L), s"coarse top-2 must be (4, 0): $ents")
    // un-sampled ids never become entries, however close to the query
    assert(!ents.contains(3L))
    // the walk from the coarse entry reaches node 3 in ONE hop (4 → 3),
    // where the fixed distant seed 0 needs three (0 → 1 → 2 → 3).
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (4L, 3L))
      .toDF("src", "dst")
    val hier = graft.search.Ann.graphTopK(edges, vectors, qv,
      graft.search.Ann.hierEntries(vectors, qv, 4, 2),
      beam = 2, hops = 1, k = 10).collect().map(_.getLong(0)).toSeq
    assert(hier.head == 3L, s"1-hop walk from coarse entries: $hier")
    val fixed = graft.search.Ann.graphTopK(edges, vectors, qv,
      Seq(0L).toDF("id"), beam = 2, hops = 1, k = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(!fixed.contains(3L), s"fixed distant seed cannot reach 3 in 1 hop: $fixed")
  }

  test("ppsSystematic: zero-weight rows are never selected; all-zero stratum yields nothing") {
    // the zero-weight row's interval is empty — it cannot cover a multiple
    val df = Seq((1L, "s", 0L), (2L, "s", 10L), (3L, "z", 0L), (4L, "z", 0L))
      .toDF("doc_id", "source", "n_chars")
    // all-zero stratum: total = 0 -> integer division guard matters
    val sel = graft.functions.Sampling
      .ppsSystematic(df, "source", "n_chars", "doc_id", n = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(sel == Seq(2L), sel.toString)
  }

  test("phrase search: a term absent from the index yields empty, not an error") {
    val idx = graft.index.Bm25Index.ensure(spark, Sf0001)
    val docs = graft.tables.Tables.documents(spark, Sf0001)
    val out = graft.index.Bm25Index.phraseTopK(
      spark, idx, docs, "doc_id", "text", Seq("zzzmissing", "table"), 10)
    assert(out.count() == 0)
    // adjacency matters: both terms present somewhere never implies the
    // phrase — a reversed phrase must be a subset of the unordered hits
    val fwd = graft.index.Bm25Index.phraseTopK(
      spark, idx, docs, "doc_id", "text", Seq("big", "table"), 1000)
      .collect().map(_.getLong(0)).toSet
    assert(fwd.nonEmpty)
    // every confirmed doc really contains its exact phrase
    val joined = docs.where(col("doc_id").isin(fwd.toSeq: _*))
      .select(concat_ws(" ", lit(" "), col("text"), lit(" ")).as("t"))
      .collect().map(_.getString(0))
    assert(joined.forall(_.contains(" big table ")))
  }

  test("clusterSafeSplit with an empty pair set reduces to the per-id split") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val out = graft.functions.Sampling
      .clusterSafeSplit(docs, "doc_id", empty, "id_a", "id_b", 5000)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val plain = graft.functions.Sampling.hashSample(docs, "doc_id", 5000)
      .collect().map(_.getLong(0)).toSet
    out.foreach { case (id, side) =>
      assert((side == "heldout") == plain(id), s"$id: $side vs $plain")
    }
  }

  test("chunkWindows: empty text yields no chunks; short text one full-coverage chunk; overlap reconstructs") {
    val docs = Seq((1L, ""), (2L, "a b c"), (3L, (1 to 60).map("w" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val out = graft.functions.TextOps.chunkWindows(docs, "doc_id", "text", 32, 24)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(!out.exists(_._1 == 1L))
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 3L, "a b c")))
    val c3 = out.filter(_._1 == 3L).sortBy(_._2)
    assert(c3.map(_._2).toSeq == Seq(0L, 1L, 2L)) // starts 0, 24, 48
    // stride-aligned reconstruction: dropping each chunk's overlap prefix
    // (except the first) rebuilds the exact token stream
    val rebuilt = c3.head._4 +: c3.tail.map(c =>
      c._4.split(" ").drop(32 - 24).mkString(" ")).filter(_.nonEmpty)
    assert(rebuilt.mkString(" ") == (1 to 60).map("w" + _).mkString(" "))
  }

  test("mmr with k and m exceeding the corpus returns every vector once, ranked") {
    val vecs = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val qv = Seq(Tuple1(Array(1.0f, 0.0f))).toDF("qvec")
    val out = graft.search.Ann.mmrRerank(vecs, qv, m = 50, k = 50, lambda = 0.7)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(out.toList == List((1, 1L), (2, 2L)), out.toList.toString)
  }

  test("schemaDrift: type change detected; null-rate shift reported on kept fields") {
    val a = Seq((1L, "x", 10), (2L, "y", 20)).toDF("id", "v", "n")
    val b = Seq((1L, "x", 10.0), (2L, null.asInstanceOf[String], 20.0))
      .toDF("id", "v", "n") // n: int -> double, v gains a null
    val out = graft.ingest.Lifecycle.schemaDrift(a, b)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("id" -> "kept", "v" -> "kept", "n" -> "type_changed"), out)
    val vRow = graft.ingest.Lifecycle.schemaDrift(a, b)
      .where($"field" === "v").head()
    assert(vRow.getDouble(4) == 0.0 && vRow.getDouble(5) == 0.5,
      "null fractions must reflect each side")
  }

  test("graph text search: empty query embeds to the zero vector, scores 0.0, never NaN") {
    // V6 semantics carried into mode=graph: an empty token set embeds to
    // the zero vector (an UNKNOWN token still lands in an occupied md5
    // bucket — that's the hashing-tfidf contract, same as s9) -> cosine
    // 0.0 everywhere (not NaN); the walk still returns k rows (all-zero
    // scores, id-ordered cuts keep it total)
    val rows = graft.search.SearchEngine
      .graphSearch(spark, Sf0001, "   ", 5)
      .collect()
    assert(rows.length == 5, rows.mkString(","))
    assert(rows.forall(r => r.getDouble(1) == 0.0), rows.mkString(","))

    // and an unknown token is NOT the zero vector: it hashes into a
    // corpus bucket and retrieves that bucket's neighborhood
    val unk = graft.search.SearchEngine
      .graphSearch(spark, Sf0001, "qqqqzz notinanycorpus", 5)
      .collect()
    assert(unk.length == 5 && unk.forall(r => !r.getDouble(1).isNaN))
  }

  test("blocked vector percolation: firings are a subset of exact; full probe == exact") {
    import org.apache.spark.sql.functions.{col, lit}
    val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")
    val alerts = emb.where(col("vec_id").isin(0L, 1L, 2L))
      .select(col("vec_id").as("alert_id"), col("embedding").as("avec"))
      .withColumn("threshold", lit(0.25))
    val centroids = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = rows(graft.search.Percolate.vectorMatches(emb, alerts))
    val narrow = rows(graft.search.Percolate
      .vectorMatchesBlocked(emb, alerts, centroids, 1))
    val full = rows(graft.search.Percolate
      .vectorMatchesBlocked(emb, alerts, centroids, 10))
    assert(narrow.subsetOf(exact) && exact.nonEmpty)
    assert(full == exact) // nprobe = |centroids| is exactly the broadcast form
  }

  test("hybrid percolation: fires only on term-conjunction AND vector-threshold; either alone is not enough") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "spark join fast"),   // terms match; vector far -> no fire
      (2L, "spark join slow"),   // terms match; vector close -> FIRES
      (3L, "unrelated words")    // vector identical; no terms -> no fire
    ).toDF("doc_id", "text")
    val a = Seq(1.0f, 0.0f, 0.0f)
    val far = Seq(0.0f, 1.0f, 0.0f)
    val near = Seq(0.9f, 0.1f, 0.0f)
    val emb = Seq((1L, far), (2L, near), (3L, a)).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val alerts = Seq((7, Seq("spark", "join"), a, 0.5))
      .toDF("alert_id", "terms", "avec", "threshold")
      .select(col("alert_id"), col("terms"),
        col("avec").cast("array<float>").as("avec"), col("threshold"))
    val fired = graft.search.Percolate
      .hybridMatches(docs, emb, alerts, "doc_id", "text")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(fired.toSeq == Seq((7, 2L)), fired.mkString(","))
  }

  test("hybrid percolation INVERTED == broadcast composition at a non-broadcastable alert count; anchor probe stays shuffled") {
    // the alert-corpus-scale composition (r10 VERDICT #3): term arm =
    // inverted anchor equi-join, vector confirm = fired set broadcast
    // INTO one pass over the alert table. Fired set must be identical to
    // the thousands-scale broadcast composition; the term arm's anchor
    // probe must stay a shuffled join (the alert table is the premise
    // that cannot broadcast).
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$Sf0001/documents.parquet")
    val emb = spark.read.parquet(s"$Sf0001/embeddings.parquet")
    // hundreds of alerts synthesized from the corpus itself: each doc's
    // first two distinct tokens + its own embedding at threshold 0.2
    val alerts = docs.where(col("doc_id") < 300)
      .select(col("doc_id").as("alert_id"),
        slice(array_distinct(graft.functions.TextOps.tokens(col("text"))),
          1, 2).as("terms"))
      .join(emb.select(col("vec_id").as("alert_id"),
        col("embedding").as("avec")), Seq("alert_id"))
      .withColumn("threshold", lit(0.2))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val inv = graft.search.Percolate
      .hybridMatchesInverted(docs, emb, alerts, "doc_id", "text")
    assert(inv.queryExecution.executedPlan.toString
      .contains("ShuffledHashJoin"), "anchor probe must be shuffled")
    val invRows = rows(inv)
    val bcRows = rows(graft.search.Percolate
      .hybridMatches(docs, emb, alerts, "doc_id", "text"))
    assert(invRows == bcRows && invRows.nonEmpty,
      s"inverted hybrid diverged: ${invRows.size} vs ${bcRows.size}")
  }

  test("snippets: window semantics — densest span wins, leftmost on ties, short docs serve whole text") {
    // hand-checkable corpus routed through a scratch index: doc 1's
    // densest 3-token window is the trailing 'join spark join' (2 hits
    // for [spark join] at pos 2: 'filter join spark'? no — count per
    // start: pos 3 'join spark join' = 3 hits); doc 2 shorter than the
    // window serves its full text; leftmost tie on doc 3 (two windows
    // with 1 hit each -> pos 0 wins)
    val docs = Seq(
      (1L, "alpha beta filter join spark join"),
      (2L, "spark join"),
      (3L, "spark beta gamma spark")).toDF("doc_id", "text")
    val out = Files.createTempDirectory("graft-snip").toString
    graft.index.Bm25Index.build(docs, "doc_id", "text", out)
    import org.apache.spark.sql.expressions.Window
    // inline the SearchEngine.snippets body against the scratch index
    // (the public surface binds to a dataDir's ensured index)
    val hits = graft.index.Bm25Index.topK(spark, out, "doc_id",
      Seq("spark", "join"), 10).withColumnRenamed("doc_id", "id")
    val ids = hits.select(col("id")).collect().map(_.getLong(0)).toSeq
    val toks = docs.where(col("doc_id").isin(ids: _*))
      .select(col("doc_id").as("id"),
        graft.functions.TextOps.tokens(col("text")).as("toks"))
    val wSpan = Window.partitionBy(col("id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, 2)
    val wBest = Window.partitionBy(col("id"))
      .orderBy(col("n_hits").desc, col("pos").asc)
    val best = toks
      .select(col("id"), col("toks"),
        posexplode(col("toks")).as(Seq("pos", "tok")))
      .withColumn("flag",
        when(col("tok").isin("spark", "join"), 1L).otherwise(0L))
      .withColumn("n_hits", sum(col("flag")).over(wSpan))
      .withColumn("rn", row_number().over(wBest))
      .where(col("rn") === 1)
      .select(col("id"), col("n_hits"),
        array_join(slice(col("toks"), col("pos") + 1, lit(3)), " ")
          .as("snippet"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(best(1L) == (3L, "join spark join"))
    assert(best(2L) == (2L, "spark join")) // shorter than the window
    assert(best(3L) == (1L, "spark beta gamma")) // leftmost tie
  }

  test("cascade rerank: L2 order is pure cosine over the L1 shortlist; shortlist membership is L1's") {
    val got = graft.search.SearchEngine.cascadeRerank(
        spark, Sf0001, Seq("spark", "join", "filter"), 0L, 50, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val shortlist = graft.search.SearchEngine.bm25TopK(
        spark, Sf0001, Seq("spark", "join", "filter"), 50)
      .collect().map(_.getLong(0)).toSet
    assert(got.map(_._1).forall(shortlist), "L2 invented a candidate")
    // re-scoring is the exact dense cosine: every served score matches
    // the corpus-wide dense ranking's score for that id
    val dense = graft.search.SearchEngine.denseTopK(spark, Sf0001, 0L, 500)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    got.foreach { case (id, s) => assert(s == dense(id), s"drift for $id") }
    assert(got == got.sortBy { case (id, s) => (-s, id) } && got.size == 10)
  }
}
