package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small LRU cache for per-(session, dataset) materialized indexes
  * (gram-pair table, cosine-pair table, IVF assignment). Keyed by the
  * OWNING SparkSession — not just applicationId — so a second session
  * in the same app never receives a frame bound to another session's
  * state; bounded so a long-lived service iterating over many corpora
  * doesn't accumulate checkpoint blocks; the caller-supplied `release`
  * runs on eviction (round-3 advisor). */
final class SessionLruCache[V](cap: Int, release: V => Unit) {
  private val m =
    new java.util.LinkedHashMap[(SparkSession, String), V](16, 0.75f, true)

  def getOrElseUpdate(s: SparkSession, key: String)(build: => V): V =
    synchronized {
      Option(m.get((s, key))).getOrElse {
        val v = build
        m.put((s, key), v)
        if (m.size > cap) {
          val it = m.entrySet().iterator()
          val eldest = it.next()
          it.remove()
          release(eldest.getValue)
        }
        v
      }
    }
}

object SessionLruCache {
  /** Best-effort eager release of a localCheckpoint'd frame's blocks.
    * The checkpoint is an RDD-level persist, so `Dataset.unpersist`
    * (cache-manager scoped) cannot see it — unpersist the underlying
    * LogicalRDD. If the plan shape ever changes, dropping the cache
    * reference still lets the ContextCleaner reclaim the blocks once
    * the RDD is garbage-collected; eager release is an optimization,
    * not a correctness requirement. */
  def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false); ()
      case _ => ()
    }
}
