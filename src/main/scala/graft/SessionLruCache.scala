package graft

import org.apache.spark.sql.SparkSession

/** Small LRU cache for per-(session, dataset) materialized indexes
  * (gram-pair table, cosine-pair table, IVF assignment). Keyed by the
  * OWNING SparkSession — not just applicationId — so a second session
  * in the same app never receives a frame bound to another session's
  * state; bounded so a long-lived service iterating over many corpora
  * doesn't accumulate checkpoint blocks (round-3 advisor).
  *
  * Eviction DROPS the reference rather than eagerly unpersisting:
  * a localCheckpoint'd frame has truncated lineage, so unpersisting
  * its blocks while an earlier caller still holds a lazy plan over it
  * would make that plan unrecoverable (checkpoint blocks cannot be
  * recomputed). Dropping the reference is safe on both sides — an
  * in-flight consumer keeps the RDD (and its blocks) alive, and once
  * the last reference is garbage-collected Spark's ContextCleaner
  * unpersists the blocks.
  *
  * `build` runs OUTSIDE the cache-wide lock (an index build is
  * multi-second Spark work; serializing unrelated datasets behind it
  * would convoy concurrent callers); concurrent requests for the SAME
  * key coalesce onto one build via an in-flight future.
  */
final class SessionLruCache[V](cap: Int) {
  private val m =
    new java.util.LinkedHashMap[(SparkSession, String), V](16, 0.75f, true)
  private val inflight = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), java.util.concurrent.CompletableFuture[V]]()

  def getOrElseUpdate(s: SparkSession, key: String)(build: => V): V = {
    val k = (s, key)
    val cached = synchronized(m.get(k))
    if (cached != null) return cached
    val fresh = new java.util.concurrent.CompletableFuture[V]()
    val prior = inflight.putIfAbsent(k, fresh)
    if (prior != null) return prior.join()
    try {
      val v = build
      synchronized {
        m.put(k, v)
        if (m.size > cap) {
          val it = m.entrySet().iterator()
          it.next(); it.remove() // drop eldest; ContextCleaner reclaims
        }
      }
      fresh.complete(v)
      v
    } catch {
      case e: Throwable => fresh.completeExceptionally(e); throw e
    } finally inflight.remove(k)
  }
}
