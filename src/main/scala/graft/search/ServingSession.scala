package graft.search

import org.apache.spark.sql.SparkSession

/** Serving-tier Spark session — the two-tier deployment pattern made
  * explicit: batched serving plans are FIXED-SHAPE (the same small plan
  * per request batch, tiny broadcast sides, one partial-top-k window),
  * so adaptive re-planning gains them nothing, while every AQE exchange
  * materialization is an extra Spark JOB whose fixed submit/launch cost
  * is exactly what amortized serving is trying not to pay. Measured on
  * a12_batched_ann (8-query IVF batch, sf0.1): AQE on = 9 jobs, off =
  * 6 jobs, ~18% lower p50.
  *
  * Analytics sessions keep AQE on — skew-join splitting and partition
  * coalescing matter for the corpus-scale dedup/graph work. The split
  * is session-level config on the SAME SparkContext and SharedState:
  * cached tables and index artifacts are shared (the CacheManager lives
  * in SharedState), so a table persisted by either tier serves both.
  * This mirrors how a real deployment separates a low-latency serving
  * tier from batch analytics without duplicating the cluster.
  */
object ServingSession {
  // weak keys: a stopped-and-dropped base session must not be pinned by
  // this registry in a long-lived multi-session process
  private val cache =
    new java.util.WeakHashMap[SparkSession, SparkSession]()

  /** The serving twin of `base` (memoized per base session). */
  def of(base: SparkSession): SparkSession = cache.synchronized {
    val hit = cache.get(base)
    if (hit != null) hit
    else {
      val s = base.newSession()
      s.conf.set("spark.sql.adaptive.enabled", "false")
      cache.put(base, s)
      s
    }
  }
}
