package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.HashOps

/** Multimodal column handling: image/audio/video as opaque `BINARY`
  * payloads with typed metadata (the 100 TB training-data extension).
  *
  * Design: media rides in the same table as text — a `payload BINARY`
  * column plus a `media_meta` struct — so partition pruning, column
  * pruning and predicate pushdown all apply; a scan that never touches
  * `payload` never reads those bytes (columnar parquet).
  *
  * DECODE IS STUBBED: this container has no image/audio codecs, so
  * [[FakeCodec]] derives deterministic pseudo-features from the bytes.
  * The Spark-side plumbing — schema, batch iteration via mapPartitions,
  * partition sizing — is real and is what carries over when a real codec
  * replaces the stub.
  */
object Multimodal {

  /** Media record: what a decode/feature-extract stage consumes and
    * produces. Mirrors a Pandas-UDF batch row shape. */
  final case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte],
      width: Option[Int], height: Option[Int], duration_ms: Option[Long])

  final case class MediaFeatures(
      media_id: Long, kind: String, size_bytes: Long,
      brightness: Double, n_frames: Int)

  /** Attach media columns to a document table: payload = utf-8 bytes of
    * the text (stand-in blob), kind cycles image/audio/video, metadata
    * derived deterministically. Every derivation is a Column expression —
    * pushdown-friendly. */
  def attachMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = HashOps.tokenHash32(col(textCol))
    docs
      .withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("kind",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col(idCol) % 3).cast("int") + 1))
      .withColumn("width",
        when(col("kind") === "image" || col("kind") === "video",
          (lit(64) + (h % 16) * lit(16)).cast("int")))
      .withColumn("height",
        when(col("kind") === "image" || col("kind") === "video",
          (lit(64) + (shiftright(h, 4) % 16) * lit(16)).cast("int")))
      .withColumn("duration_ms",
        when(col("kind") =!= "image", lit(500L) + (h % 100) * lit(100L)))
  }

  /** STUB CODEC — deterministic pseudo-decode. A real deployment swaps
    * this object for JNI/codec calls; signatures stay identical. */
  object FakeCodec {
    /** "Decode" → mean byte value as brightness; frame count from size. */
    def decode(m: MediaRow): MediaFeatures = {
      val bytes = m.payload
      val brightness =
        if (bytes.isEmpty) 0.0
        else bytes.map(b => (b & 0xFF).toDouble).sum / bytes.length
      val frames = m.kind match {
        case "video" => 1 + (bytes.length % 10)
        case _       => 1
      }
      MediaFeatures(m.media_id, m.kind, bytes.length.toLong,
        math.rint(brightness * 1e6) / 1e6, frames)
    }
  }

  /** Batch decode via mapPartitions: one codec init per partition (the
    * expensive part with real codecs), then streamed per-row decode —
    * the Scala analog of a Pandas-UDF batch. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: val codec = Codec.open() here, once per partition
      rows.map(FakeCodec.decode)
    }
  }

  /** Deterministic 16-bin nibble histogram of a binary payload, as a
    * float vector — the STAND-IN embedding for multimodal retrieval (a
    * real deployment replaces this Column with a model call in the
    * decode stage; everything downstream — ANN, dedup, fusion — is
    * embedding-agnostic and unchanged). A single codegen'd pass over the
    * raw bytes ([[org.apache.spark.sql.graft.NibbleHistogram]]): hex(p)
    * has one char per nibble, so per-hex-char counts ARE per-nibble
    * counts — value-identical to counting the hex string, without
    * materializing it 16× via length-after-translate. No UDF, no
    * shuffle, reproducible on any engine. */
  def byteHistogram(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      org.apache.spark.sql.graft.NibbleHistogram(
        org.apache.spark.sql.graft.ColumnBridge.expression(payload)))

  /** Deterministic frame sampling for video payloads: n evenly spaced
    * byte windows across the WHOLE payload — frame i starts at byte
    * floor(i·size/n), each frame is `frameBytes` bytes. Hex-encoded (hex,
    * unlike Spark's base64, never inserts MIME line breaks — the encoding
    * must be pure for the windows to be engine-independent). */
  def frameSample(media: DataFrame, n: Int, frameBytes: Int): DataFrame =
    media.where(col("kind") === "video")
      .withColumn("__hex", hex(col("payload")))
      .withColumn("__hexlen", length(col("__hex")))
      .withColumn("frame_idx", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("frame", expr(
        s"substring(__hex, cast((frame_idx * __hexlen) div $n AS INT) + 1, ${frameBytes * 2})"))
      .where(length(col("frame")) > 0)
      .drop("__hex", "__hexlen")

  /** Frame-fingerprint VIDEO dedup — the YouTube/ContentID shape over
    * the [[frameSample]] fingerprints: two videos are near-dup suspects
    * when ≥ `minShared` of their sampled frame fingerprints collide
    * exactly. The plan is the d-family's LSH discipline applied to
    * media: candidate pairs come from an EQUI-JOIN on the fingerprint —
    * only media whose fingerprints actually collide ever meet, never
    * all-pairs — and super-common fingerprints (a black frame, a
    * silence block: boilerplate, not identity) are dropped by the
    * `maxFrameDf` gate BEFORE the join, which is what bounds the
    * per-fingerprint fan-out at corpus scale (the same size gate as
    * MinHash band buckets). Counting shared fingerprints per pair is a
    * partial-agg groupBy; output (id_a, id_b, shared_frames),
    * id_a < id_b, fully deterministic (exact string equality — a real
    * deployment swaps the hex windows for perceptual hashes at the
    * [[frameSample]] slot; everything downstream is hash-agnostic). */
  def frameDupPairs(media: DataFrame, idCol: String, n: Int,
                    frameBytes: Int, minShared: Int,
                    maxFrameDf: Int = 50): DataFrame = {
    val fr = frameSample(media, n, frameBytes)
      .select(col(idCol), col("frame")).distinct()
    val keep = fr.groupBy(col("frame"))
      .agg(count(lit(1)).as("__df"))
      .where(col("__df") <= maxFrameDf)
      .select(col("frame"))
    val fk = fr.join(keep, Seq("frame"))
    fk.select(col("frame"), col(idCol).as("id_a"))
      .join(fk.select(col("frame"), col(idCol).as("id_b")), Seq("frame"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared_frames"))
      .where(col("shared_frames") >= minShared)
      .orderBy(col("id_a"), col("id_b"))
  }
}
