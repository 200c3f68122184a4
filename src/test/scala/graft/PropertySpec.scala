package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{HashOps, TextOps, VectorOps}

/** Property-style tests: ScalaCheck generators produce the samples, one
  * batched Spark pass verifies all of them against an independent Scala
  * model (running a Spark job per ScalaCheck trial would be prohibitively
  * slow; batching keeps the property coverage and the speed). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.from(0).map(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
      .collect { case Some(v) => v }.take(n).toSeq

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const(' '))).map(_.mkString)

  test("fingerprint == independent rolling-hash model for random strings") {
    val texts = samples(asciiText, 200).distinct
    def model(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    val got = texts.toDF("t")
      .select(col("t"), TextOps.fingerprint(col("t")).as("fp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    texts.foreach(t => assert(got(t) == model(t), s"fingerprint mismatch for '$t'"))
  }

  test("stableId == independent md5-prefix model for random strings") {
    val texts = samples(asciiText.suchThat(_.nonEmpty), 100).distinct
    def model(s: String): Long = java.lang.Long.parseLong(
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)
    val got = texts.toDF("t")
      .select(col("t"), HashOps.stableId(col("t")).as("id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    texts.foreach(t => assert(got(t) == model(t)))
  }

  test("tokens == split-and-drop-empties model; counts match") {
    val texts = samples(asciiText, 200).distinct
    val got = texts.toDF("t")
      .select(col("t"), TextOps.tokens(col("t")).as("toks"),
        TextOps.tokenCountWs(col("t")).as("n"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1), r.getInt(2)))
    got.foreach { case (t, toks, n) =>
      val want = t.split(" ").filter(_.nonEmpty).toSeq
      assert(toks == want, s"tokens mismatch for '$t'")
      assert(n == want.length)
    }
  }

  test("ewma ordered fold == independent scala fold for random sequences") {
    val seqs = samples(Gen.nonEmptyListOf(Gen.chooseNum(-1000.0, 1000.0)), 60)
    def model(xs: List[Double]): Double =
      xs.tail.foldLeft(xs.head)((acc, x) => 0.3 * x + 0.7 * acc)
    val got = seqs.zipWithIndex.map { case (xs, i) => (i, xs) }
      .toDF("id", "vals")
      .select(col("id"), expr(
        "aggregate(slice(vals, 2, greatest(size(vals) - 1, 0)), " +
          "element_at(vals, 1), (acc, x) -> 0.3D * x + 0.7D * acc)").as("ewma"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    seqs.zipWithIndex.foreach { case (xs, i) =>
      assert(got(i) == model(xs), s"ewma fold diverged for seq $i")
    }
  }

  test("zorder layout is lossless for random two-column tables") {
    val rows = samples(Gen.zip(Gen.chooseNum(-5000L, 5000L),
      Gen.chooseNum(0L, 100000L)), 400).distinct
    val df = rows.toDF("a", "b")
    val out = java.nio.file.Files.createTempDirectory("graft-zprop").toString
    graft.ingest.Store.zorderLayout(df, s"$out/t", "a", "b", numFiles = 8)
    val back = spark.read.parquet(s"$out/t")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(back == rows.toSet, "z-order write/read must preserve exactly the rows")
  }

  test("codegen cosine == scalar model; bounded in [-1,1]; symmetric") {
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-10f, 10f))
    val pairs = samples(Gen.zip(vecGen, vecGen), 100)
      .map { case (a, b) => (a.toArray, b.toArray) }
    def model(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val got = pairs.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("i", "a", "b")
      .select(col("i"), VectorOps.cosineSim(col("a"), col("b")).as("ab"),
        VectorOps.cosineSim(col("b"), col("a")).as("ba"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).toSeq
    got.foreach { case (i, ab, ba) =>
      val (a, b) = pairs(i)
      assert(math.abs(ab - model(a, b)) < 1e-12)
      assert(ab == ba, "cosine must be symmetric")
      assert(ab >= -1.0000001 && ab <= 1.0000001)
    }
  }

  test("connectedComponents == union-find model on random graphs") {
    // a handful of random edge sets, each checked against a driver-side
    // union-find — one Spark run per graph (the operator is iterative),
    // so keep the graph count small and the graphs varied
    val edgeGen = for {
      n <- Gen.chooseNum(2, 40)
      m <- Gen.chooseNum(1, 60)
      edges <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0, n - 1); b <- Gen.chooseNum(0, n - 1)
        if a != b
      } yield (math.min(a, b).toLong, math.max(a, b).toLong))
    } yield edges.distinct
    samples(edgeGen, 5).filter(_.nonEmpty).foreach { edges =>
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val model = parent.keys.map(x => x -> find(x)).toMap
      val got = graft.dedup.Dedup
        .connectedComponents(edges.toDF("id_a", "id_b"), "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == model, s"CC mismatch on ${edges.take(10)}...")
    }
  }

  test("clusterSafeSplit: no near-dup cluster ever straddles the split") {
    // corpus with planted clusters: random pair sets over a small id
    // space; every connected component must land entirely on one side,
    // and unpaired docs must match the plain per-id hash split
    val edgeGen = for {
      m <- Gen.chooseNum(1, 30)
      edges <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0, 29); b <- Gen.chooseNum(0, 29)
        if a != b
      } yield (math.min(a, b).toLong, math.max(a, b).toLong))
    } yield edges.distinct
    samples(edgeGen, 3).filter(_.nonEmpty).foreach { edges =>
      val docs = (0L until 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      val out = graft.functions.Sampling.clusterSafeSplit(
          docs, "doc_id", edges.toDF("id_a", "id_b"), "id_a", "id_b", 3000)
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      // component model on the driver
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.toSeq.groupBy(find).foreach { case (_, members) =>
        val sides = members.map(out).toSet
        assert(sides.size == 1, s"cluster $members split across $sides")
      }
      val clustered = parent.keys.toSet
      (0L until 40L).filterNot(clustered).foreach { i =>
        val plain = graft.functions.Sampling
          .hashSample(docs.where($"doc_id" === i), "doc_id", 3000).count() == 1
        assert((out(i) == "heldout") == plain, s"unpaired doc $i side mismatch")
      }
    }
  }

  test("rrf rank monotonicity: better rank never scores lower") {
    // pure-model property of the fusion formula used in Fusion.rrf
    val ranks = samples(Gen.chooseNum(1, 1000), 200)
    ranks.sliding(2).foreach {
      case Seq(r1, r2) =>
        val (lo, hi) = (math.min(r1, r2), math.max(r1, r2))
        assert(1.0 / (60 + lo) >= 1.0 / (60 + hi))
      case _ =>
    }
  }

  test("capPerGroup == naive single-window model on random skewed tables") {
    import org.apache.spark.sql.expressions.Window
    val rows = samples(for {
      id <- Gen.chooseNum(0L, 5000L)
      grp <- Gen.frequency(6 -> Gen.const("hot"), 4 -> Gen.oneOf("a", "b", "c", "d"))
      v <- Gen.chooseNum(0L, 20L) // narrow range -> many ties
    } yield (id, grp, v), 600).distinctBy(_._1)
    val df = rows.toDF("id", "grp", "v")
    for (cap <- Seq(1, 3, 17); salts <- Seq(1, 4)) {
      val got = graft.functions.Sampling.capPerGroup(df, "grp", "v", "id", cap, salts)
        .select("id").collect().map(_.getLong(0)).toSet
      val naive = df.withColumn("rn", row_number().over(
          Window.partitionBy(col("grp")).orderBy(col("v").desc, col("id").asc)))
        .where(col("rn") <= cap).select("id")
        .collect().map(_.getLong(0)).toSet
      assert(got == naive, s"cap=$cap salts=$salts")
    }
  }

  test("duplicatedNgrams: cloning the corpus drives every doc to dup_frac 1.0") {
    val texts = samples(asciiText.suchThat(_.trim.split("\\s+").count(_.nonEmpty) >= 3), 40)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    // every doc duplicated under a fresh id -> every gram occurs in >= 2 docs
    val cloned = docs.union(docs.withColumn("doc_id", col("doc_id") + 10000L))
    val fr = graft.dedup.Dedup.duplicatedNgrams(cloned, "doc_id", "text", 3, 0.0)
      .collect().map(r => r.getDouble(2))
    assert(fr.nonEmpty && fr.forall(_ == 1.0))
    // and fractions are always within [0, 1] on the un-cloned corpus
    val solo = graft.dedup.Dedup.duplicatedNgrams(docs, "doc_id", "text", 3, 0.0)
      .collect().map(r => r.getDouble(2))
    assert(solo.forall(f => f >= 0.0 && f <= 1.0))
  }

  test("exactSubstrDedup == naive in-memory model on random small corpora") {
    val w = 3
    // tiny alphabet so w-gram collisions actually happen
    val tinyDoc: Gen[String] = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString(" ")))
    val corpus = samples(tinyDoc, 40).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    def model(docs: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
      val occ = for {
        (id, t) <- docs
        toks = t.split(" ").filter(_.nonEmpty).toSeq
        s <- 0 to toks.length - w
      } yield (toks.slice(s, s + w).mkString(" "), id, s.toLong)
      val byGram = occ.groupBy(_._1)
      val removed = occ.filter { case (g, id, s) =>
        val all = byGram(g)
        all.size > 1 && all.map(o => (o._2, o._3)).min != ((id, s))
      }.groupBy(_._2).view.mapValues(_.map(_._3).toSet).toMap
      docs.map { case (id, t) =>
        val toks = t.split(" ").filter(_.nonEmpty).toSeq
        val starts = removed.getOrElse(id, Set.empty)
        val kept = toks.indices.filterNot(i =>
          starts.exists(s => s <= i && i < s + w))
        id -> ((toks.length.toLong, (toks.length - kept.length).toLong,
          kept.map(toks).mkString(" ")))
      }.toMap
    }
    val want = model(corpus)
    val got = graft.dedup.Dedup
      .exactSubstrDedup(corpus.toDF("doc_id", "text"), "doc_id", "text", w)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got == want)
    // conservation: a corpus with no duplicated w-gram passes through intact
    val uniq = Seq((1L, "p q r s"), (2L, "t u v x")).toDF("doc_id", "text")
    val out = graft.dedup.Dedup.exactSubstrDedup(uniq, "doc_id", "text", w)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq((1L, 0L, "p q r s"), (2L, 0L, "t u v x")))
  }

  test("delete+repair property: for random corpora and delete sets, repaired graph == rebuild over survivors") {
    import graft.index.IncrementalKnn
    import graft.search.Ann
    // deterministic pseudo-random vectors (md5-derived components) —
    // arbitrary geometry without Math.random; 3 trials x (corpus size,
    // delete fraction) drawn from ScalaCheck generators
    def vecs(n: Int, salt: Int): Seq[(Long, Seq[Float])] =
      (0 until n).map { i =>
        val h = MessageDigest.getInstance("MD5")
          .digest(s"v$salt:$i".getBytes("UTF-8"))
        (i.toLong, h.take(8).map(b => (b.toInt & 0xff) / 255.0f).toSeq)
      }
    val trials = samples(for {
      n <- Gen.choose(40, 90)
      delFrac <- Gen.choose(1, 4)
      salt <- Gen.choose(0, 1000)
    } yield (n, delFrac, salt), 3)
    for (((n, delFrac, salt), t) <- trials.zipWithIndex) {
      val emb = vecs(n, salt).toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      val centroids = emb.where(col("vec_id") < 5)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-prop-rep$t").toString + "/g"
      IncrementalKnn.init(emb.where(col("vec_id") % 2 === 0), centroids, root, 2, 3)
      IncrementalKnn.append(emb.where(col("vec_id") % 2 === 1), root, 2, 3)
      val dels = (0 until n).filter(_ % 7 < delFrac).map(_.toLong)
      IncrementalKnn.delete(dels.toDF("vec_id"), root, tag = Some("d"))
      IncrementalKnn.repair(spark, root, 2, 3, tag = Some("r"))
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
      val repaired = rows(IncrementalKnn.edges(spark, root, 3))
      val rebuilt = rows(Ann.knnGraph(
        emb.where(!col("vec_id").isin(dels: _*)), centroids, 2, 3))
      assert(repaired == rebuilt && rebuilt.nonEmpty,
        s"trial $t (n=$n delFrac=$delFrac salt=$salt): repaired != rebuilt")
    }
  }

  test("tieredFoldStart properties: bounds hold, fan-in cap enforced or clamped at keep, similar-size runs never split, dominant base spared") {
    import graft.index.SegmentStore.tieredFoldStart
    // pure function — full ScalaCheck sweep, no Spark in the loop
    val cases = samples(for {
      n <- Gen.choose(2, 24)
      sizes <- Gen.listOfN(n, Gen.oneOf(
        Gen.choose(0L, 64L),              // empty-ish fresh batches
        Gen.choose(1L, 1L << 20),         // mid tiers
        Gen.choose(1L << 20, 1L << 34)))  // dominant bases
      keep <- Gen.choose(0, n - 1)
      maxSegments <- Gen.choose(1, n + 4)
    } yield (sizes, keep, maxSegments), 400)
    for (((sizes, keep, maxSegments), i) <- cases.zipWithIndex) {
      val m = tieredFoldStart(sizes, keep, maxSegments)
      val ctx = s"case $i: sizes=$sizes keep=$keep max=$maxSegments m=$m"
      // bounds: never folds protected entries; a triggered fold merges
      // at least two segments unless clamped at keep
      assert(m >= keep, ctx)
      assert(m <= math.max(keep, sizes.size - 2), ctx)
      // fan-in: post-fold live count (m + 1) honors the hard bound, or
      // the start is clamped at keep (correctness floor wins)
      assert(m + 1 <= maxSegments || m == keep, ctx)
      // determinism (a pure plan): same input, same start
      assert(tieredFoldStart(sizes, keep, maxSegments) == m, ctx)
    }
    // similar-size runs never split: when EVERY segment is within the
    // ratio of every other, the fold takes the whole unprotected suffix
    val flat = samples(for {
      n <- Gen.choose(2, 16)
      base <- Gen.choose(1L, 1L << 30)
      sizes <- Gen.listOfN(n, Gen.choose(base, base * 4))
      keep <- Gen.choose(0, n - 2)
    } yield (sizes, keep), 150)
    for (((sizes, keep), i) <- flat.zipWithIndex) {
      val m = tieredFoldStart(sizes, keep, maxSegments = sizes.size + 1)
      assert(m == keep, s"flat case $i: run split at $m (keep=$keep): $sizes")
    }
    // a dominant base is left alone while the fan-in bound allows it
    val dom = samples(for {
      n <- Gen.choose(3, 12)
      tail <- Gen.listOfN(n - 1, Gen.choose(100L, 400L))
    } yield 1000000L +: tail, 100)
    for ((sizes, i) <- dom.zipWithIndex) {
      val m = tieredFoldStart(sizes, keep = 0, maxSegments = sizes.size + 1)
      assert(m == 1, s"dominant case $i: base absorbed (m=$m): $sizes")
    }
  }

  test("ladderCheck properties: warns exactly when the fan-in bound is below the observed tier span; flat ladders never warn") {
    import graft.index.SegmentStore.ladderCheck
    val cases = samples(for {
      n <- Gen.choose(1, 20)
      sizes <- Gen.listOfN(n, Gen.choose(0L, 1L << 34))
      maxSegments <- Gen.choose(1, 24)
    } yield (sizes, maxSegments), 300)
    for (((sizes, maxSegments), i) <- cases.zipWithIndex) {
      val nz = sizes.map(math.max(_, 1L))
      val tiers = (math.log(nz.max.toDouble / nz.min.toDouble) /
        math.log(4.0)).toInt + 1
      val warned = ladderCheck(sizes, maxSegments).isDefined
      assert(warned == (maxSegments < tiers),
        s"case $i: sizes=$sizes max=$maxSegments tiers=$tiers warned=$warned")
    }
    // a single-tier (flat) ladder fits any bound >= 1
    for (s <- Seq(Seq(5L, 5L, 5L), Seq(0L, 0L), Seq(1L << 20, 1L << 21)))
      assert(ladderCheck(s, 1).isEmpty, s.toString)
  }
}
