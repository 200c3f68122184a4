package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

import graft.index.IncrementalKnn

/** Per-process serving state for an incrementally-GROWN kNN graph root —
  * the "resolve once per session" half of the freshness story (r10
  * VERDICT #2: the grown walk re-resolved pointer/ledger/segment state
  * inside every hop's job, making `s28b_graph_grown` the most expensive
  * s-query at a varying job count).
  *
  * What a grown-root read costs per call without this: [[IncrementalKnn
  * .edges]]/[[IncrementalKnn.vectorsAll]]/[[IncrementalKnn.coarseAll]]
  * each re-probe the commit markers, re-read the tombstone ledger, and
  * re-build the per-segment union plan — and the seek walk then executes
  * that whole subtree once per hop. A server does this ONCE: the three
  * merged frames are resolved against the root's mutation clock
  * ([[IncrementalKnn.stateVersions]] — index segments, tombstone ledger,
  * repair ledger), persisted in storage memory (the reference keeps its
  * serving HNSW RAM-resident — `on_disk=False`; on a cluster the same
  * persist spreads over executor storage memory), and every request
  * re-validates with three filesystem probes. Any mutation — append,
  * delete, upsert, repair, compaction behind the pointer — bumps one of
  * the three clocks, and the next request rebuilds the state and
  * unpersists the stale frames, so freshness stays "one trigger
  * interval", exactly as before; only the per-request re-resolution is
  * gone.
  *
  * The persisted frames keep their pruning power: the cached batches
  * inherit the `_srt` layouts' sortedness (edges ordered by src, vecs by
  * vec_id), so the in-memory scan's per-batch min/max stats prune the
  * walk's `src IN (frontier)` / `vec_id IN (...)` point lookups the same
  * way the parquet row groups did.
  */
object GrownServing {

  final case class State(root: String, clock: (Int, Int, Int),
                         edges: DataFrame, vectors: DataFrame,
                         coarse: DataFrame)

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, State]()

  /** Resolved + warmed serving frames for `root` (graph degree `k`),
    * rebuilt iff the root's mutation clock moved since the cached
    * resolve. The warm-up counts materialize the persisted frames so
    * the first query after a mutation pays the fill, not every query. */
  def of(spark: SparkSession, root: String, k: Int): State = {
    val key = s"$root#k=$k"
    val clock = IncrementalKnn.stateVersions(root)
    val hit = cache.get(key)
    if (hit != null && hit.clock == clock) {
      // an external storage sweep (a bench harness unpersisting between
      // queries, an admin unpersist-all) may have dropped the frames
      // while the resolve stayed valid; re-pin lazily — persist on an
      // unpersisted frame re-registers it, the next use refills
      Seq(hit.edges, hit.vectors, hit.coarse).foreach { df =>
        if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
          df.persist(StorageLevel.MEMORY_AND_DISK)
      }
      hit
    }
    else synchronized {
      val h2 = cache.get(key)
      if (h2 != null && h2.clock == clock) h2
      else {
        if (h2 != null)
          Seq(h2.edges, h2.vectors, h2.coarse)
            .foreach(_.unpersist(blocking = false))
        val st = State(root, clock,
          IncrementalKnn.edges(spark, root, k)
            .persist(StorageLevel.MEMORY_AND_DISK),
          IncrementalKnn.vectorsAll(spark, root)
            .persist(StorageLevel.MEMORY_AND_DISK),
          IncrementalKnn.coarseAll(spark, root)
            .persist(StorageLevel.MEMORY_AND_DISK))
        st.edges.count(); st.vectors.count(); st.coarse.count()
        cache.put(key, st)
        st
      }
    }
  }

  /** Drop every cached root's frames (serving-cache clear — the
    * `DELETE /api/search/cache` surface). */
  def clear(): Unit = synchronized {
    cache.values.forEach(st =>
      Seq(st.edges, st.vectors, st.coarse)
        .foreach(_.unpersist(blocking = false)))
    cache.clear()
  }
}
