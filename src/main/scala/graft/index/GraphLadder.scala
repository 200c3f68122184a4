package graft.index

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Ladder of coarse entry layers for graph-ANN walks — the HNSW
  * upper-LAYERS analogue, completing what the single mod-16 layer
  * ([[KnnGraphIndex.coarse]]) started (reference: Qdrant's HNSW keeps a
  * geometric stack of sparser layers above layer 0,
  * `scripts/indexing.py:326-340`; our single coarse layer matched its
  * FIRST upper layer only).
  *
  * Why: entry selection over one fixed-mod layer scans corpus/16 rows —
  * the one remaining corpus-PROPORTIONAL term in the seek-path serving
  * plans (r14 BENCHNOTES slope leg calls it out). A geometric ladder
  * (vec_id % 16^L == 0, L = 1..3 — nested subsets, stable across
  * appends) lets entry selection scan the SMALLEST persisted layer that
  * still carries enough entry candidates: the chosen layer has between
  * `minRows` and ~16·minRows rows at ANY corpus size (each rung is 16×
  * sparser than the next), so the entry scan is O(1) in the corpus and
  * the whole walk is corpus-independent — point-seek hops
  * ([[graft.search.Ann.graphTopKSeekBatched]]) plus a bounded entry
  * scan. The walk tolerates sparser entries the way DiskANN serves
  * billion-scale corpora from a single medoid seed: the beam search does
  * the navigation, entries only pick the starting neighborhood.
  *
  * Level choice is DETERMINISTIC from the level row counts (counted at
  * build, stored in the artifact), so an external engine replays it
  * exactly: the a35 oracle's SQL picks the same level with the same
  * `count(*) WHERE vec_id % m = 0 >= minRows` cascade.
  */
object GraphLadder {

  /** Rung moduli, sparsest first: 16^3, 16^2, 16^1. The densest rung
    * (16) duplicates [[KnnGraphIndex.CoarseMod]]'s layer so the ladder
    * is self-contained — one artifact answers entry selection alone. */
  val Mods: Seq[Int] = Seq(4096, 256, 16)

  /** Ladder over the corpus `embeddings` table (the a35 oracle's). */
  val Name = "graph_ladder_v1"

  /** Ladder over the text-query graph's tfidf vector space — the rung
    * stack `mode=graph` serving uses when [[servingMinRows]] is set. */
  val TfIdfName = "tfidf_graph_ladder_v1"

  /** Opt-in serving switch: set `-Dgraft.graph.entry.ladder.min.rows=N`
    * (N > 0) and the graph-mode serving routes select entries from the
    * sparsest tfidf rung with >= N candidates instead of the fixed
    * mod-16 coarse layer. OFF by default — a different entry set gives
    * (legitimately) different approximate results, so flipping the walk
    * family under pinned route oracles is an operator decision, made
    * when the corpus outgrows the mod-16 scan. */
  def servingMinRows: Option[Long] =
    sys.props.get("graft.graph.entry.ladder.min.rows")
      .flatMap(_.toLongOption).filter(_ > 0)

  /** Build (once) the rung stack for an arbitrary (vec_id, embedding)
    * vector space under artifact `name`. */
  def ensureOver(spark: SparkSession, dataDir: String, name: String)
                (vectors: => DataFrame): String =
    IndexCatalog.ensure(spark, dataDir, name) { out =>
      val vecs = vectors.select(col("vec_id"), col("embedding"))
      val counts = Mods.map { m =>
        vecs.where(pmod(col("vec_id"), lit(m)) === lit(0))
          .repartitionByRange(2, col("vec_id"))
          .sortWithinPartitions(col("vec_id"))
          .write.mode(SaveMode.Overwrite).parquet(s"$out/mod=$m")
        m -> spark.read.parquet(s"$out/mod=$m").count()
      }
      // level row counts as a tiny driver-readable sidecar: level choice
      // at query time is one small-file read, never a count job
      val json = counts.map { case (m, n) => s""""$m":$n""" }
        .mkString("{", ",", "}")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(out, "_level_counts.json"),
        json.getBytes("UTF-8"))
    }

  private def ensureDir(spark: SparkSession, dataDir: String): String =
    ensureOver(spark, dataDir, Name)(Tables.embeddings(spark, dataDir))

  private def countsIn(dir: String): Map[Int, Long] = {
    val raw = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_level_counts.json")), "UTF-8")
    raw.stripPrefix("{").stripSuffix("}").split(',').map { kv =>
      val Array(k, v) = kv.split(':')
      k.replace("\"", "").trim.toInt -> v.trim.toLong
    }.toMap
  }

  /** Build-time row count per rung (from the sidecar, no job). */
  def levelCounts(spark: SparkSession, dataDir: String): Map[Int, Long] =
    countsIn(ensureDir(spark, dataDir))

  private def levelIn(spark: SparkSession, dir: String,
                      minRows: Long): (Int, DataFrame) = {
    val counts = countsIn(dir)
    val mod = Mods.find(m => counts.getOrElse(m, 0L) >= minRows)
      .getOrElse(Mods.last)
    (mod, spark.read.parquet(s"$dir/mod=$mod"))
  }

  /** The SPARSEST rung still carrying at least `minRows` candidates
    * (falling back to the densest rung when even it is small — tiny
    * corpora just scan their mod-16 layer). Returns (mod, layer rows):
    * the layer's size is in [minRows, ~16·minRows) whenever any sparser
    * rung exists, so entry-selection I/O is bounded at any corpus
    * size. */
  def level(spark: SparkSession, dataDir: String,
            minRows: Long): (Int, DataFrame) =
    levelIn(spark, ensureDir(spark, dataDir), minRows)

  /** [[level]] over the tfidf text-embedding space ([[TfIdfName]]) —
    * built lazily from [[TfIdfGraphIndex.vectors]] on first use. */
  def tfidfLevel(spark: SparkSession, dataDir: String,
                 minRows: Long): (Int, DataFrame) =
    levelIn(spark,
      ensureOver(spark, dataDir, TfIdfName)(
        TfIdfGraphIndex.vectors(spark, dataDir)),
      minRows)
}
