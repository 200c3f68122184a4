package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ingest.Store
import graft.search.Stats

class StoreStatsSpec extends SparkSpec {
  import spark.implicits._

  test("full import overwrites; upsert bumps versions and archives history") {
    val dir = Files.createTempDirectory("graft-store").toString
    val main = s"$dir/main"

    val v1 = Seq((1L, 1, "alpha"), (2L, 1, "beta")).toDF("id", "version", "text")
    Store.fullImport(v1, main)
    assert(Store.read(spark, main).count() == 2)

    val incoming = Seq((2L, "beta2"), (3L, "gamma")).toDF("id", "text")
    val (newMain, hist) = Store.upsertVersioned(
      Store.read(spark, main), incoming, "id", Seq("text"))

    val m = newMain.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(m == Set((1L, 1, "alpha"), (2L, 2, "beta2"), (3L, 1, "gamma")))

    val h = hist.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3))).toSet
    assert(h == Set((2L, 1, "beta", "2_v1"))) // only the replaced row archives

    // round-trip: publish the merged table and re-read
    Store.fullImport(newMain, s"$dir/main_v2")
    assert(Store.read(spark, s"$dir/main_v2").count() == 3)
  }

  test("counted import observes row/null-id metrics on the write pass") {
    val dir = Files.createTempDirectory("graft-import").toString
    val df = Seq((Some(1L), "a"), (None, "b"), (Some(3L), "c"))
      .toDF("id", "text")
    val (rows, nullIds) = Store.fullImportCounted(df, s"$dir/t", "id")
    assert(rows == 3 && nullIds == 1)
    assert(Store.read(spark, s"$dir/t").count() == 3)
  }

  test("ewma matches the reference's avg*0.9 + x*0.1 smoothing") {
    val e = new Stats.Ewma(0.1)
    e.record("search", 100.0)
    assert(e.get("search").contains(100.0))
    e.record("search", 200.0)
    assert(math.abs(e.get("search").get - (100.0 * 0.9 + 200.0 * 0.1)) < 1e-9)
    e.timed("block") { Thread.sleep(5) }
    assert(e.get("block").exists(_ >= 5.0))
    assert(e.snapshot.keySet == Set("search", "block"))
  }

  test("health counts cover every table") {
    val h = Stats.healthCounts(spark, Sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(h.keySet == graft.tables.Tables.names.toSet)
    assert(h("documents") == 500)
    assert(h.values.forall(_ > 0))
  }

  test("compact: many small files collapse, data identical, swap is atomic-shaped") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val path = s"$dir/t"
    val docs = graft.tables.Tables.documents(spark, Sf0001)
    docs.repartition(37).write.parquet(path) // simulate micro-batch debris
    val before = docs.collect().map(_.getLong(0)).sorted.toSeq

    val (nBefore, nAfter) = graft.ingest.Store.compact(spark, path)
    assert(nBefore == 37 && nAfter < nBefore, s"$nBefore -> $nAfter")
    val after = spark.read.parquet(path)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(after == before)
    // staging/backup dirs cleaned up by the swap
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(path + "__compact_tmp")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(path + "__compact_old")))

    // trailing slash normalizes instead of nesting the staging dir
    val (b2, a2) = graft.ingest.Store.compact(spark, path + "/")
    assert(b2 == nAfter && a2 >= 1)

    // sorted compaction preserves a point-lookup layout (pushdown intact)
    graft.ingest.Store.compact(spark, path, sortCols = Seq("source"))
    val plan = spark.read.parquet(path).where(
      org.apache.spark.sql.functions.col("source") === "src7")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(source), EqualTo(source,src7)]"), plan)

    // partitioned layouts are refused, not silently flattened
    val partPath = s"$dir/part_t"
    docs.write.partitionBy("lang").parquet(partPath)
    intercept[IllegalArgumentException] {
      graft.ingest.Store.compact(spark, partPath)
    }
  }

  test("compactPartitioned: leaves collapse independently, pruning survives, compact leaves skip") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-part").toString
    val path = s"$dir/t"
    val docs = graft.tables.Tables.documents(spark, Sf0001)
    // micro-batch debris inside each lang partition
    docs.repartition(9).write.partitionBy("lang").parquet(path)
    val before = docs.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq

    val (touched, nBefore, nAfter) = graft.ingest.Store.compactPartitioned(spark, path)
    assert(touched > 0 && nAfter < nBefore, s"$touched partitions, $nBefore -> $nAfter")

    // data identical, partition column intact
    val after = spark.read.parquet(path)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(after == before)

    // the hive structure survived: partition pruning still fires
    val plan = spark.read.parquet(path).where(col("lang") === "en")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang#"), plan)
    // no phantom partitions leaked from staging/backup dirs
    val langs = spark.read.parquet(path).select("lang").distinct()
      .collect().map(_.getString(0)).toSet
    assert(langs == docs.select("lang").distinct().collect().map(_.getString(0)).toSet)

    // a second pass finds every leaf already at 1 file and rewrites nothing
    val (touched2, _, _) = graft.ingest.Store.compactPartitioned(spark, path)
    assert(touched2 == 0, s"re-compacted $touched2 already-compact partitions")

    // flat tables are refused, pointed at compact()
    val flat = s"$dir/flat"
    docs.limit(10).write.parquet(flat)
    intercept[IllegalArgumentException] {
      graft.ingest.Store.compactPartitioned(spark, flat)
    }
  }

  test("snapshot swap recovers from every crash point") {
    import graft.ingest.Store
    import spark.implicits._
    def v(n: Int) = Seq((1L, n)).toDF("id", "v")
    def readV(p: String): Int =
      Store.readSnapshot(spark, p).get.select("v").head().getInt(0)
    def mv(a: String, b: String): Unit = {
      val fs = new org.apache.hadoop.fs.Path(a)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.rename(new org.apache.hadoop.fs.Path(a),
        new org.apache.hadoop.fs.Path(b)))
    }
    val dir = java.nio.file.Files.createTempDirectory("snap").toString

    // clean path: v1 then v2
    val p1 = s"$dir/a"
    Store.replaceSnapshot(v(1), p1); assert(readV(p1) == 1)
    Store.replaceSnapshot(v(2), p1); assert(readV(p1) == 2)

    // crash BEFORE the base->old rename: complete .new exists, base
    // intact -> the replace never committed; reads keep the old version
    v(3).write.parquet(s"$p1.new")
    assert(readV(p1) == 2)

    // crash BETWEEN base->old and .new->base: base missing, .new is
    // complete -> recovery promotes the new version
    val p2 = s"$dir/b"
    Store.replaceSnapshot(v(1), p2)
    v(2).write.parquet(s"$p2.new")
    mv(p2, s"$p2.old")
    assert(readV(p2) == 2, "complete .new must promote")

    // crash MID-WRITE after an (out-of-order) base move: .new incomplete
    // (no _SUCCESS), old present -> recovery rolls back to the old version
    val p3 = s"$dir/c"
    Store.replaceSnapshot(v(1), p3)
    mv(p3, s"$p3.old")
    new java.io.File(s"$p3.new").mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$p3.new/part-torn.parquet"), "torn")
    assert(readV(p3) == 1, "incomplete .new must roll back")

    // and a subsequent replace on each recovered path works cleanly
    Seq(p1, p2, p3).foreach { p =>
      Store.replaceSnapshot(v(9), p); assert(readV(p) == 9)
    }
  }

  test("ServingCache: a fill of one key never blocks requests to another key") {
    // the lock is PER KEY — a long build (persist+count jobs) of one
    // index's frames must not stall pure hits or fills on unrelated
    // keys (r11 ADVICE: the global monitor was a throughput cliff after
    // every mutation/invalidation)
    import graft.search.ServingCache
    import spark.implicits._
    import java.util.concurrent.{CountDownLatch, TimeUnit}
    ServingCache.clear()
    val inBuild = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val slow = new Thread(() => {
      ServingCache.frames("svc-spec-slow", ()) {
        inBuild.countDown()
        release.await(60, TimeUnit.SECONDS)
        Seq(Seq(1L).toDF("x"))
      }
      ()
    })
    slow.start()
    assert(inBuild.await(60, TimeUnit.SECONDS), "slow build never started")
    try {
      // under a global monitor this future could only complete after
      // `release` fires — i.e. it would time out here
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration._
      val fast = Future {
        ServingCache.frames("svc-spec-fast", ())(Seq(Seq(2L).toDF("y")))
          .head.collect().map(_.getLong(0)).toSeq
      }
      assert(Await.result(fast, 60.seconds) == Seq(2L),
        "fill of an unrelated key was blocked by the slow build")
    } finally {
      release.countDown()
      slow.join(60000)
    }
    assert(!slow.isAlive)
    // both entries landed and clear() drops them (per-key monitors)
    assert(ServingCache.frames("svc-spec-slow", ())(fail("must be a hit"))
      .head.collect().map(_.getLong(0)).toSeq == Seq(1L))
    ServingCache.clear()
  }
}
