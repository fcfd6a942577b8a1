package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

/** The index-cache contract: bounded LRU, per-key build coalescing,
  * builds of DIFFERENT keys not serialized, failed builds retryable. */
class SessionLruCacheSpec extends AnyFunSuite {
  private def session = SparkSuite.spark

  test("bounds entries to the cap, evicting least-recently-used first") {
    val c = new SessionLruCache[Int](2)
    val builds = new AtomicInteger(0)
    def get(k: String) = c.getOrElseUpdate(session, k) { builds.incrementAndGet() }
    get("a"); get("b")
    assert(builds.get == 2)
    get("a") // refresh a → b is now eldest
    get("c") // evicts b
    assert(builds.get == 3)
    get("a"); get("c")
    assert(builds.get == 3, "a and c must still be cached")
    get("b")
    assert(builds.get == 4, "b was evicted and must rebuild")
  }

  test("concurrent requests for the same key coalesce onto one build") {
    val c = new SessionLruCache[Int](4)
    val builds = new AtomicInteger(0)
    val entered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(4)
    try {
      val tasks = (1 to 4).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = c.getOrElseUpdate(session, "k") {
            entered.countDown()
            release.await(10, TimeUnit.SECONDS)
            builds.incrementAndGet()
          }
        })
      }
      assert(entered.await(10, TimeUnit.SECONDS))
      release.countDown()
      assert(tasks.map(_.get(10, TimeUnit.SECONDS)).toSet == Set(1))
      assert(builds.get == 1)
    } finally pool.shutdownNow()
  }

  test("a slow build of one key does not block a different key") {
    val c = new SessionLruCache[Int](4)
    val slowEntered = new CountDownLatch(1)
    val slowRelease = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    try {
      val slow = pool.submit(new java.util.concurrent.Callable[Int] {
        def call(): Int = c.getOrElseUpdate(session, "slow") {
          slowEntered.countDown()
          slowRelease.await(10, TimeUnit.SECONDS)
          1
        }
      })
      assert(slowEntered.await(10, TimeUnit.SECONDS))
      // must complete while the slow build is still in flight
      val fast = pool.submit(new java.util.concurrent.Callable[Int] {
        def call(): Int = c.getOrElseUpdate(session, "fast")(2)
      })
      assert(fast.get(10, TimeUnit.SECONDS) == 2,
        "independent key was serialized behind an unrelated build")
      slowRelease.countDown()
      assert(slow.get(10, TimeUnit.SECONDS) == 1)
    } finally pool.shutdownNow()
  }

  test("a failed build propagates and the key can be rebuilt") {
    val c = new SessionLruCache[Int](4)
    intercept[RuntimeException] {
      c.getOrElseUpdate(session, "k")(throw new RuntimeException("boom"))
    }
    assert(c.getOrElseUpdate(session, "k")(7) == 7)
  }
}
