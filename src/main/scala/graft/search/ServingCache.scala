package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Generic mutation-clock-keyed cache of PERSISTED serving frames — the
  * one serving-tier pattern behind [[GrownServing]] (grown kNN roots),
  * the one-shot graph artifacts ([[SearchEngine.graphSearch]]), and any
  * future RAM-resident index state: resolve + persist a read's frames
  * once, re-validate per request against a cheap clock, rebuild (and
  * unpersist the stale frames) only when the clock moves.
  *
  * The reference keeps its serving index RAM-resident (`on_disk=False`);
  * on a cluster `persist(MEMORY_AND_DISK)` spreads the same state over
  * executor storage memory. Cached batches inherit the source layout's
  * sortedness, so the in-memory scan's per-batch min/max stats keep
  * pruning point lookups the way the parquet row groups did.
  *
  * `clock` is compared with `==`: pass the state's version tuple for
  * mutable roots ([[graft.index.IncrementalKnn.stateVersions]]), or a
  * constant (`()`) for immutable build-once artifacts (the IndexCatalog
  * contract: an artifact path never changes content after its marker).
  *
  * An EXTERNAL storage sweep (a bench harness unpersisting everything
  * between queries, an admin unpersist-all) can drop the frames while
  * the resolve stays valid — hits re-pin lazily (persist on an
  * unpersisted frame re-registers it; the next use refills). */
object ServingCache {

  private final case class Entry(clock: Any, frames: Seq[DataFrame])

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  /** One lock PER KEY, not one global monitor: a cache fill runs the
    * build — including the persist+count materialization jobs — under
    * its lock (concurrent first requests after a mutation must produce
    * ONE fill, not N), and under a single global lock that fill would
    * stall every request to every OTHER key, including pure hits on
    * unrelated indexes, for the full build duration. Per-key monitors
    * keep the clear()-vs-repin leak protection (for a given key, repin
    * and unpersist still serialize) while hits and fills of distinct
    * keys proceed in parallel. The lock map grows one Object per
    * distinct key ever seen — bounded by the index-artifact count, never
    * by request volume. */
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(key: String): Object =
    locks.computeIfAbsent(key, _ => new Object)

  /** The persisted frames for `key`, built (and warmed — counted, so the
    * first request after a mutation pays the fill, not every request)
    * iff absent or `clock` moved.
    *
    * Synchronized on the KEY's monitor — including the hit path's
    * repin. An unsynchronized fast path would race [[clear]]: clear()
    * unpersists and drops the entry, a concurrent hit re-persists the
    * same frames, and the re-pinned storage is tracked by nothing — a
    * storage leak per race. The monitor cost is a map probe +
    * storageLevel checks per request (the FS clock probes happen
    * OUTSIDE, in the caller). */
  def frames(key: String, clock: Any)(build: => Seq[DataFrame]): Seq[DataFrame] =
    lockFor(key).synchronized {
      val hit = cache.get(key)
      if (hit != null && hit.clock == clock) { repin(hit.frames); hit.frames }
      else {
        if (hit != null) hit.frames.foreach(_.unpersist(blocking = false))
        val fs = build
        fs.foreach(_.persist(StorageLevel.MEMORY_AND_DISK))
        fs.foreach(_.count())
        cache.put(key, Entry(clock, fs))
        fs
      }
    }

  private def repin(fs: Seq[DataFrame]): Unit =
    fs.foreach { df =>
      if (df.storageLevel == StorageLevel.NONE)
        df.persist(StorageLevel.MEMORY_AND_DISK)
    }

  /** Drop every cached entry's frames (the `DELETE /api/search/cache`
    * surface; tests that rewrite fixture dirs in place). Takes each
    * key's monitor in turn (never nested — deadlock-free), so for every
    * key the unpersist serializes against that key's hits/fills exactly
    * as before; a fill racing the snapshot may insert a NEW key after
    * clear's pass, which is the same post-clear fill it would have run
    * anyway. */
  def clear(): Unit = {
    val keys = new java.util.ArrayList(cache.keySet())
    keys.forEach { k =>
      lockFor(k).synchronized {
        val e = cache.remove(k)
        if (e != null) e.frames.foreach(_.unpersist(blocking = false))
      }
    }
  }
}
