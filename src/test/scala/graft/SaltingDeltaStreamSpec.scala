package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.functions.Salting
import graft.streaming.DeltaStream

class SaltingDeltaStreamSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join result on skewed data") {
    // 90% of rows share one hot key
    val big = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, s"v$i"))
      .toDF("k", "payload")
    val small = Seq((1L, "dim1"), (950L, "dim950")).toDF("k", "dim")

    val plain = big.join(small, "k").select("k", "payload", "dim")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val salted = Salting.saltedJoin(big, small, "k", factor = 8)
      .select("k", "payload", "dim")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(salted == plain)
    assert(plain.size == 901)

    val counts = Salting.saltedCount(big, "k", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts(1L) == 900 && counts(950L) == 1)
  }

  test("streaming upsert pipeline: delta files -> merge -> versioned store view") {
    val deltaDir = Files.createTempDirectory("graft-delta2").toString
    val checkpoint = Files.createTempDirectory("graft-ckpt2").toString
    val store = Files.createTempDirectory("graft-store2").toString + "/main"
    val schema = new StructType().add("id", LongType).add("text", StringType)

    // seed the store at version 1
    graft.ingest.Store.fullImport(
      Seq((1L, 1, "alpha"), (2L, 1, "beta")).toDF("id", "version", "text"), store)

    val q = DeltaStream.deltaImport(spark, deltaDir, checkpoint, schema) {
      (batch, _) =>
        if (!batch.isEmpty) {
          val existing = graft.ingest.Store.read(spark, store)
          val (newMain, _) = graft.ingest.Store.upsertVersioned(
            existing, batch, "id", Seq("text"))
          // publish to a fresh path, then point the store at it (atomic-
          // publish layout; same-path overwrite would read-and-clobber)
          val next = store + "_next"
          graft.ingest.Store.fullImport(newMain, next)
          graft.ingest.Store.fullImport(
            graft.ingest.Store.read(spark, next), store)
        }
    }
    try {
      Files.writeString(java.nio.file.Paths.get(s"$deltaDir/d1.json"),
        """[{"id": 2, "text": "beta2"}, {"id": 3, "text": "gamma"}]""")
      q.processAllAvailable()
      val m = graft.ingest.Store.read(spark, store)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(m == Set((1L, 1, "alpha"), (2L, 2, "beta2"), (3L, 1, "gamma")))
    } finally q.stop()
  }

  test("delta-dir streaming import: file source + foreachBatch merge") {
    val deltaDir = Files.createTempDirectory("graft-delta").toString
    val checkpoint = Files.createTempDirectory("graft-ckpt").toString
    val schema = new StructType().add("id", LongType).add("text", StringType)

    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val q = DeltaStream.deltaImport(spark, deltaDir, checkpoint, schema) {
      (batch, batchId) => seen.add(batchId -> batch.count())
    }
    try {
      Files.writeString(java.nio.file.Paths.get(s"$deltaDir/b1.json"),
        """[{"id": 1, "text": "a"}, {"id": 2, "text": "b"}]""")
      q.processAllAvailable()
      Files.writeString(java.nio.file.Paths.get(s"$deltaDir/b2.json"),
        """[{"id": 2, "text": "b2"}]""")
      q.processAllAvailable()
      val total = seen.toArray(Array.empty[(Long, Long)]).map(_._2).sum
      assert(total == 3) // 2 docs in batch 1, 1 in batch 2, checkpoint advanced
    } finally q.stop()
  }
}
