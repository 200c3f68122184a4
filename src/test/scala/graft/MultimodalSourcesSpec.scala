package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.sources.JsonSource
import graft.tables.Tables

class MultimodalSourcesSpec extends SparkSpec {
  import spark.implicits._

  test("attachMedia: binary payload + kind-dependent typed metadata") {
    val m = Multimodal.attachMedia(
      Tables.documents(spark, Sf0001).limit(30), "doc_id", "text")
    val rows = m.select("doc_id", "kind", "width", "duration_ms").collect()
    rows.foreach { r =>
      val kind = r.getString(1)
      assert(Set("image", "audio", "video")(kind))
      if (kind == "image") { assert(!r.isNullAt(2)); assert(r.isNullAt(3)) }
      if (kind == "audio") { assert(r.isNullAt(2)); assert(!r.isNullAt(3)) }
      if (kind == "video") { assert(!r.isNullAt(2)); assert(!r.isNullAt(3)) }
    }
    // payload round-trips the source bytes
    val txt = m.select(col("text"), decode(col("payload"), "UTF-8").as("back"))
      .where(col("text") =!= col("back")).count()
    assert(txt == 0)
  }

  test("decodeFeatures: mapPartitions batch decode with the stub codec") {
    val media = Multimodal.attachMedia(
      Tables.documents(spark, Sf0001).limit(30), "doc_id", "text")
      .select(col("doc_id").as("media_id"), col("kind"), col("payload"),
        col("width"), col("height"), col("duration_ms"))
      .as[Multimodal.MediaRow]
    val feats = Multimodal.decodeFeatures(media).collect()
    assert(feats.length == 30)
    feats.foreach { f =>
      assert(f.size_bytes > 0)
      assert(f.brightness > 0 && f.brightness < 256)
      if (f.kind == "video") assert(f.n_frames >= 1 && f.n_frames <= 10)
      else assert(f.n_frames == 1)
    }
  }

  test("frameDupPairs: exact-dup videos share every frame; boilerplate gate drops super-common fingerprints") {
    // three videos (kind = id % 3 == 2): 2 and 8 are byte-identical ->
    // all 4 sampled frames collide; 5 is distinct. A fourth/fifth/sixth
    // sharing one common SHORT payload exercises the df gate.
    val docs = Seq(
      (2L, "spark join filter scan merge sort the table"),
      (5L, "completely different words here with nothing shared"),
      (8L, "spark join filter scan merge sort the table"),
      (11L, "zz"), (14L, "zz"), (17L, "zz")).toDF("doc_id", "text")
    val media = Multimodal.attachMedia(docs, "doc_id", "text")
    val pairs = Multimodal
      .frameDupPairs(media, "doc_id", 4, 6, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // identical payloads: every distinct sampled fingerprint collides
    assert(pairs.exists { case (a, b, s) => a == 2L && b == 8L && s >= 1 })
    assert(!pairs.exists { case (a, b, _) => a == 5L || b == 5L })
    // the 'zz' trio shares all its (tiny) frames pairwise at df 3 <= 50
    assert(pairs.count { case (a, b, _) =>
      Set(11L, 14L, 17L)(a) && Set(11L, 14L, 17L)(b) } == 3)
    // df gate: with maxFrameDf = 2 the zz trio's fingerprints (df 3)
    // are boilerplate and drop; the identical pair (df 2) survives
    val gated = Multimodal
      .frameDupPairs(media, "doc_id", 4, 6, minShared = 1, maxFrameDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(gated.toSet == Set((2L, 8L)))
  }

  test("json source: array file, derived text columns, stable ids") {
    val dir = Files.createTempDirectory("graft-json").toFile
    val f = new java.io.File(dir, "batch.json")
    Files.writeString(f.toPath,
      """[{"_id": "a1", "partNumber": "RAD64002019", "description": "gas torch"},
         {"_id": "a2", "partNumber": "MIL11-1101C", "description": "regulator",
          "mfrPartNumber": "M-7"}]""")
    val raw = JsonSource.readJsonArray(spark, f.getAbsolutePath)
    assert(raw.count() == 2)

    val derived = JsonSource.withStableId(
      JsonSource.deriveTextColumns(raw, "description", "partNumber", "mfrPartNumber"),
      "partNumber")
    val rows = derived.select("partNumber", "dense_text", "sparse_text", "id")
      .orderBy("partNumber").collect()
    // null-skipping concat: doc without mfrPartNumber has a 2-part sparse_text
    assert(rows(1).getString(2) == "gas torch RAD64002019")
    assert(rows(0).getString(2) == "regulator MIL11-1101C M-7")
    assert(rows(0).getString(1) == "regulator") // dense_text = description only
    assert(rows.map(_.getLong(3)).distinct.length == 2) // stable ids assigned

    val dirRead = JsonSource.readJsonDir(spark, dir.getAbsolutePath)
    assert(dirRead.count() == 2)
  }

  test("tar.gz source: reads the first .json member per archive, end to end") {
    import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveOutputStream}
    import org.apache.commons.compress.compressors.gzip.GzipCompressorOutputStream

    val dir = Files.createTempDirectory("graft-targz").toFile
    def writeArchive(name: String, members: Seq[(String, String)]): Unit = {
      val out = new TarArchiveOutputStream(new GzipCompressorOutputStream(
        new java.io.FileOutputStream(new java.io.File(dir, name))))
      members.foreach { case (memberName, text) =>
        val bytes = text.getBytes("UTF-8")
        val e = new TarArchiveEntry(memberName)
        e.setSize(bytes.length)
        out.putArchiveEntry(e)
        out.write(bytes)
        out.closeArchiveEntry()
      }
      out.close()
    }
    // archive 1: readme + the JSON payload (reference picks the .json member)
    writeArchive("products_a.tar.gz", Seq(
      "README.txt" -> "not json",
      "products.json" ->
        """[{"partNumber": "P1", "description": "torch"},
           {"partNumber": "P2", "description": "regulator"}]"""))
    // archive 2: two .json members — FIRST one wins, like the reference
    writeArchive("products_b.tar.gz", Seq(
      "first.json" -> """[{"partNumber": "P3", "description": "hose"}]""",
      "second.json" -> """[{"partNumber": "XX", "description": "ignored"}]"""))
    // archive 3: no json member — contributes no rows, import continues
    writeArchive("broken.tar.gz", Seq("data.csv" -> "a,b\n1,2"))

    val df = JsonSource.readTarGzJson(spark, s"${dir.getAbsolutePath}/*.tar.gz")
    val parts = df.select("partNumber").collect().map(_.getString(0)).sorted.toSeq
    assert(parts == Seq("P1", "P2", "P3"))
  }
}
