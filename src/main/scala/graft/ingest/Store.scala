package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed document store: the write side of the lifecycle
  * (reference §2.1 S5 upsert sink, §2.10 N1 full import / N3 versioned
  * upsert; `app/core/database.py:140-231`, `version_service.py:49-110`).
  *
  * Without a transactional table format in this environment, upsert is a
  * read-merge-rewrite job into a versioned directory (`.../v=N`) with a
  * current-pointer swap — the classic atomic-publish layout. On a real
  * deployment the same API maps 1:1 onto Delta/Iceberg `MERGE`; the join
  * shapes (anti/outer on id) are identical. Batching/parallel upload
  * (reference `parallel=16, batch 4096`) is Spark's task parallelism —
  * `repartition(n)` controls write fan-out.
  */
object Store {

  /** Crash-safe snapshot replace for read-merge-rewrite stores (single
    * writer per path). `mode("overwrite")` on the path being REPLACED has
    * an unrecoverable window: a crash after the delete but before the
    * write loses the base snapshot, and a streaming checkpoint replay
    * only re-applies the current micro-batch. Instead the new snapshot is
    * fully written NEXT TO the base (`<base>.new` — safe to stream from a
    * scan of base, which is untouched during the write), then swapped in
    * with two directory renames (atomic on HDFS/posix):
    *
    *   write .new → rename base → .old → rename .new → base → drop .old
    *
    * Every crash point leaves a recoverable state that [[recoverSnapshot]]
    * (called first on the next replace OR read) finishes: a complete
    * `.new` (has _SUCCESS) with no base promotes forward; an incomplete
    * one rolls back to `.old`. On a MERGE-capable table format
    * (Delta/Iceberg) this whole dance is the transaction log's job. */
  def replaceSnapshot(df: DataFrame, basePath: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(basePath)
      .getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    recoverSnapshot(fs, basePath)
    val base = new org.apache.hadoop.fs.Path(basePath)
    val nu = new org.apache.hadoop.fs.Path(basePath + ".new")
    val old = new org.apache.hadoop.fs.Path(basePath + ".old")
    fs.delete(nu, true); fs.delete(old, true)
    df.write.mode(SaveMode.Overwrite).parquet(nu.toString)
    if (fs.exists(base))
      require(fs.rename(base, old), s"rename $base -> $old failed")
    require(fs.rename(nu, base), s"rename $nu -> $base failed")
    fs.delete(old, true)
  }

  /** Finish an interrupted [[replaceSnapshot]]: promote a complete `.new`
    * when the base is missing, else roll back to `.old`; drop leftovers
    * once the base exists. Idempotent; no-op on a clean path. */
  def recoverSnapshot(fs: org.apache.hadoop.fs.FileSystem,
                      basePath: String): Unit = {
    val base = new org.apache.hadoop.fs.Path(basePath)
    val nu = new org.apache.hadoop.fs.Path(basePath + ".new")
    val old = new org.apache.hadoop.fs.Path(basePath + ".old")
    if (!fs.exists(base)) {
      val nuComplete = fs.exists(
        new org.apache.hadoop.fs.Path(basePath + ".new/_SUCCESS"))
      if (nuComplete) { require(fs.rename(nu, base)); fs.delete(old, true) }
      else if (fs.exists(old)) { require(fs.rename(old, base)); fs.delete(nu, true) }
    } else { fs.delete(old, true) }
  }

  /** Read a snapshot maintained by [[replaceSnapshot]], finishing any
    * interrupted swap first. Returns None when no snapshot exists. */
  def readSnapshot(spark: SparkSession, basePath: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(basePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverSnapshot(fs, basePath)
    if (fs.exists(p)) Some(spark.read.parquet(basePath)) else None
  }

  /** N1: full import — truncate-and-load semantics via overwrite. */
  def fullImport(df: DataFrame, path: String, partitions: Int = 0): Unit = {
    val out = if (partitions > 0) df.repartition(partitions) else df
    out.write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** N1 + A7: full import with progress counters. The reference tracks
    * processed/failed counts imperatively (`document_service.py:107-128`);
    * Spark's `observe` API collects the same metrics ON the write pass —
    * no second scan, and the numbers come from the executors that actually
    * wrote the rows. Returns (rows imported, rows with a null id). */
  def fullImportCounted(df: DataFrame, path: String, idCol: String,
                        partitions: Int = 0): (Long, Long) = {
    val obs = org.apache.spark.sql.Observation("import")
    val observed = df.observe(obs,
      count(lit(1)).as("n_rows"),
      count(when(col(idCol).isNull, 1)).as("n_null_ids"))
    fullImport(observed, path, partitions)
    val m = obs.get
    (m("n_rows").asInstanceOf[Long], m("n_null_ids").asInstanceOf[Long])
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Hive-style partitioned layout (the time/tenant axis of a 100 TB
    * store): queries filtering on the partition column read only matching
    * directories — `PartitionFilters` in the scan, zero I/O elsewhere. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** O7: bucketed table layout for co-located joins. Two tables bucketed
    * by the same key and count join WITHOUT a shuffle — at 100 TB the
    * documents⋈embeddings join (the engine's core access path) must be
    * co-located, not re-shuffled per query. `BucketedJoinSpec` asserts the
    * exchange-free plan. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketCol: String, numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)

  /** O1: file-layout optimization replacing the reference's keyword payload
    * indexes (`scripts/indexing.py:383-443`). Range-partition + sort by the
    * lookup keys so parquet row-group min/max statistics prune point
    * lookups, and enable a parquet bloom filter on each key for the
    * high-cardinality exact-match case (part numbers). At 100 TB this is
    * what turns `WHERE part_number = 'X'` from a full scan into a handful
    * of row groups — the 1-5 ms vs 100+ ms gap the reference attributes to
    * its payload indexes. */
  def optimizeLayout(df: DataFrame, path: String, sortCols: Seq[String],
                     numFiles: Int, bloomCols: Seq[String] = Nil): Unit = {
    val writer = df
      .repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      // zstd: ~30% smaller than snappy on sorted text/posting layouts —
      // at 100 TB the index footprint is storage + scan bandwidth
      .option("compression", "zstd")
    val blooms = if (bloomCols.nonEmpty) bloomCols else sortCols
    blooms.foldLeft(writer) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
    }.parquet(path)
  }

  /** Z-order (Morton-curve) multi-column clustering layout — the
    * two-dimensional sibling of [[optimizeLayout]]: a single-column sort
    * gives tight parquet row-group min/max stats on ONE column and
    * near-useless stats on every other; interleaving the bits of both
    * columns' bucket ranks clusters rows so stats stay tight on BOTH.
    * At 100 TB this is what lets `WHERE lang = 'de' AND n_chars > 900`
    * skip most row groups when either predicate alone is unselective —
    * the same trick Delta/Iceberg OPTIMIZE ZORDER applies.
    *
    * Bucket ranks are equi-width over each column's (min, max), computed
    * in one 1-row aggregate (broadcast, no per-row driver traffic). For
    * heavily skewed columns the classic refinement is quantile-based
    * boundaries; equi-width keeps the build one pass and is what the
    * synthetic corpus needs. `bits` per column bounds the interleave at
    * 2·bits <= 62. */
  def zorderLayout(df: DataFrame, path: String, colA: String, colB: String,
                   numFiles: Int, bits: Int = 10): Unit = {
    require(2 * bits <= 62, s"bits=$bits would overflow the interleaved key")
    val maxBucket = (1L << bits) - 1
    val bounds = df.agg(
      min(col(colA).cast("double")).as("min_a"),
      max(col(colA).cast("double")).as("max_a"),
      min(col(colB).cast("double")).as("min_b"),
      max(col(colB).cast("double")).as("max_b"))
    def bucket(c: Column, lo: Column, hi: Column): Column =
      least(lit(maxBucket), greatest(lit(0L),
        floor((c.cast("double") - lo) / (hi - lo + lit(1e-12)) * (maxBucket + 1))
          .cast("long")))
    val interleaved = (0 until bits).map { i =>
      (shiftright(col("__ba"), i).bitwiseAND(lit(1L)) * lit(2L) +
        shiftright(col("__bb"), i).bitwiseAND(lit(1L))) * lit(1L << (2 * i))
    }.reduce(_ + _)
    df.crossJoin(broadcast(bounds))
      .withColumn("__ba", bucket(col(colA), col("min_a"), col("max_a")))
      .withColumn("__bb", bucket(col(colB), col("min_b"), col("max_b")))
      .withColumn("__zkey", interleaved)
      .drop("min_a", "max_a", "min_b", "max_b", "__ba", "__bb")
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
      .write.mode(SaveMode.Overwrite)
      .option("compression", "zstd")
      .parquet(path)
  }

  /** Small-file compaction — the housekeeping a streamed/delta-written
    * store needs: micro-batch writers leave thousands of tiny files whose
    * per-file open/footer overhead dominates scans at scale. Rewrites the
    * table at ~`targetBytes` per file (computed from the actual on-disk
    * size), staging to a SIBLING dir and swapping live → backup →
    * promote, so no failure mode loses DATA (a crash mid-swap leaves
    * either the live dir or the `__compact_old` backup intact).
    *
    * AVAILABILITY caveat: the swap is two renames, and between them the
    * live path briefly does not exist — a concurrent read in a long-lived
    * serving JVM can fail during that window, and a crash exactly between
    * the renames needs a manual restore from `__compact_old`. Raw
    * filesystems cannot atomically replace a non-empty directory, so run
    * compaction in a maintenance window (or point readers at a catalog
    * indirection that flips after the promote). A table format with
    * atomic commits is the structural fix at cluster scale.
    *
    * FLAT tables only: Hive-partitioned layouts (directory per partition
    * value) are rejected — a naive rewrite would silently flatten the
    * partition structure and destroy `PartitionFilters` pruning; compact
    * each partition directory individually instead. Pass `sortCols` to
    * preserve a sorted point-lookup layout ([[optimizeLayout]] semantics:
    * range-partitioned + sorted within files); compression stays zstd,
    * matching the index layouts. Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024,
              sortCols: Seq[String] = Nil): (Int, Int) = {
    val p = new org.apache.hadoop.fs.Path(path) // normalizes trailing slash
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(p)
    val subDirs = entries.filter(_.isDirectory).map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith("."))
    require(subDirs.isEmpty,
      s"compact requires a flat table; found partition-style subdirectories " +
        s"${subDirs.take(3).mkString(", ")} under $p — compact per partition")
    compactLeaf(spark, fs, p, targetBytes, sortCols, hidden = false)
  }

  /** Compact ONE directory of parquet files in place (the body shared by
    * [[compact]] and [[compactPartitioned]]). `hidden` dot-prefixes the
    * staging/backup dirs so that, when the leaf is a partition INSIDE a
    * live table, concurrent readers listing the table never see the
    * transient dirs as phantom partitions (Spark skips `.`/`_` names). */
  private def compactLeaf(spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
                          p: org.apache.hadoop.fs.Path, targetBytes: Long,
                          sortCols: Seq[String], hidden: Boolean): (Int, Int) = {
    val dataFiles = fs.listStatus(p).filter(f =>
      f.isFile && f.getPath.getName.endsWith(".parquet"))
    val totalBytes = dataFiles.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

    val prefix = if (hidden) "." else ""
    val tmp = new org.apache.hadoop.fs.Path(p.getParent, prefix + p.getName + "__compact_tmp")
    val old = new org.apache.hadoop.fs.Path(p.getParent, prefix + p.getName + "__compact_old")
    fs.delete(tmp, true); fs.delete(old, true)
    val shaped =
      if (sortCols.nonEmpty)
        spark.read.parquet(p.toString)
          .repartitionByRange(nOut, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else spark.read.parquet(p.toString).repartition(nOut)
    shaped.write.mode(SaveMode.Overwrite)
      .option("compression", "zstd").parquet(tmp.toString)

    // live -> backup, staged -> live, drop backup; every rename checked
    require(fs.rename(p, old), s"compact: could not move live table aside ($p)")
    if (!fs.rename(tmp, p)) {
      fs.rename(old, p) // restore
      throw new IllegalStateException(s"compact: promote failed, restored $p")
    }
    fs.delete(old, true)
    val after = fs.listStatus(p).count(f =>
      f.isFile && f.getPath.getName.endsWith(".parquet"))
    (dataFiles.length, after)
  }

  /** Per-partition compaction for hive-partitioned layouts (the
    * [[writePartitioned]] maintenance twin): each leaf partition directory
    * compacts independently with [[compactLeaf]], so the directory
    * structure — and with it `PartitionFilters` pruning — survives, and a
    * failure window is confined to the single partition being promoted.
    * Partitions already at `minFiles` or fewer files are skipped: on a
    * 100 TB store the streaming writer touches a handful of recent
    * partitions and historical ones stay compact, so a maintenance pass
    * must not rewrite the whole table.
    *
    * Returns (partitionsCompacted, filesBefore, filesAfter) over the
    * partitions actually rewritten.
    */
  def compactPartitioned(spark: SparkSession, path: String,
                         targetBytes: Long = 128L * 1024 * 1024,
                         sortCols: Seq[String] = Nil,
                         minFiles: Int = 1): (Int, Int, Int) = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def leaves(dir: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
      val subs = fs.listStatus(dir).filter(e => e.isDirectory &&
        !e.getPath.getName.startsWith("_") && !e.getPath.getName.startsWith("."))
      if (subs.isEmpty) Seq(dir) else subs.toSeq.flatMap(s => leaves(s.getPath))
    }
    val parts = leaves(root)
    require(parts != Seq(root),
      s"$path has no partition subdirectories — use compact() for flat tables")
    var (touched, before, after) = (0, 0, 0)
    parts.foreach { lp =>
      val n = fs.listStatus(lp).count(f =>
        f.isFile && f.getPath.getName.endsWith(".parquet"))
      if (n > minFiles) {
        val (b, a) = compactLeaf(spark, fs, lp, targetBytes, sortCols, hidden = true)
        touched += 1; before += b; after += a
      }
    }
    (touched, before, after)
  }

  /** N3: versioned upsert. Incoming rows replace matches (version bumped),
    * prior versions of replaced rows append to the history table with the
    * reference's `{id}_v{version}` key. Unmatched existing rows carry
    * over; brand-new ids enter at version 1.
    *
    * Returns (newMain, historyDelta) as DataFrames; caller persists via
    * [[fullImport]] / append. One full-outer join on id — no per-doc
    * round-trips. */
  def upsertVersioned(existing: DataFrame, incoming: DataFrame,
                      idCol: String, payloadCols: Seq[String]): (DataFrame, DataFrame) = {
    val e = existing.select(
      (col(idCol) +: col("version").as("old_version") +:
        payloadCols.map(c => col(c).as(s"old_$c"))): _*)
    val i = incoming.select((col(idCol) +: payloadCols.map(col)): _*)
      .withColumn("__incoming", lit(true))
    val joined = e.join(i, Seq(idCol), "full_outer")

    val newMain = joined.select(
      (col(idCol) +:
        when(col("__incoming"), coalesce(col("old_version") + 1, lit(1)))
          .otherwise(col("old_version")).cast("int").as("version") +:
        payloadCols.map(c =>
          when(col("__incoming"), col(c)).otherwise(col(s"old_$c")).as(c))): _*)

    val historyDelta = joined
      .where(col("__incoming") && col("old_version").isNotNull)
      .select(
        (col(idCol) +: col("old_version").as("version") +:
          payloadCols.map(c => col(s"old_$c").as(c))): _*)
      .withColumn("history_id",
        concat(col(idCol).cast("string"), lit("_v"), col("version").cast("string")))

    (newMain, historyDelta)
  }
}
