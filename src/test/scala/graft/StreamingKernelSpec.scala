package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps

/** The st02 interval-merge kernel vs the sorted-gap reference: same
  * session count for ANY arrival order — the property that lets the
  * stateful operator drop the O(events) sort buffer. */
class StreamingKernelSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  private def sortedGapSessions(ts: Seq[Long], gap: Long): Long = {
    val s = ts.sorted
    if (s.isEmpty) 0L
    else 1L + s.zip(s.tail).count { case (a, b) => b - a > gap }
  }

  test("mergeSessions equals sorted-gap sessionization for any arrival order") {
    val gen = for {
      gap <- Gen.chooseNum(1L, 50L)
      ts <- Gen.listOf(Gen.chooseNum(0L, 500L))
      shuffled <- Gen.const(scala.util.Random.shuffle(ts))
    } yield (gap, shuffled)
    check(Prop.forAll(gen) { case (gap, ts) =>
      val (n, sessions) = StreamingOps.mergeSessions(ts.iterator, gap)
      n == ts.length.toLong && sessions == sortedGapSessions(ts, gap)
    })
  }

  test("duplicate timestamps collapse into one session, never split") {
    val (n, s) = StreamingOps.mergeSessions(Iterator(10L, 10L, 10L, 100L), 5L)
    assert(n == 4L && s == 2L)
  }

  test("TreeMap store equals the ArrayBuffer reference kernel on any order") {
    val gen = for {
      gap <- Gen.chooseNum(1L, 50L)
      ts <- Gen.listOf(Gen.chooseNum(0L, 500L))
      shuffled <- Gen.const(scala.util.Random.shuffle(ts))
    } yield (gap, shuffled)
    check(Prop.forAll(gen) { case (gap, ts) =>
      val store = new StreamingOps.IntervalStore
      val n = store.addAll(ts.iterator, gap)
      val iv = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      StreamingOps.mergeInto(iv, ts.iterator, gap)
      val (starts, ends) = store.toArrays
      n == ts.length.toLong &&
        starts.zip(ends).toSeq == iv.toSeq // identical intervals, not just counts
    })
  }

  test("adverse newest-first arrival: store stays correct (the O(log s) case)") {
    // descending timestamps spaced past the gap create a NEW leftmost
    // session per event — the arrival order that cost the ArrayBuffer
    // store O(sessions) shifting per event and motivated the TreeMap
    val gap = 10L
    val ts = (0 until 2000).map(i => (1999 - i) * 100L) // 2000 disjoint sessions
    val store = new StreamingOps.IntervalStore
    val n = store.addAll(ts.iterator, gap)
    assert(n == 2000L && store.size == 2000)
    assert(sortedGapSessions(ts, gap) == 2000L)
    // and with a bridging pass after: every other event closes a gap
    val bridge = (0 until 1999).map(i => i * 100L + 50L)
    val store2 = new StreamingOps.IntervalStore
    store2.addAll(scala.util.Random.shuffle(ts ++ bridge).iterator, 50L)
    assert(store2.size.toLong == sortedGapSessions(ts ++ bridge, 50L))
  }

  test("batch-split merging via seeded TreeMap store (st12's persisted form)") {
    val gen = for {
      gap <- Gen.chooseNum(1L, 50L)
      ts <- Gen.listOf(Gen.chooseNum(0L, 500L))
      cut <- Gen.chooseNum(0, ts.length)
    } yield (gap, ts, cut)
    check(Prop.forAll(gen) { case (gap, ts, cut) =>
      val (batch1, batch2) = ts.splitAt(cut)
      val s1 = new StreamingOps.IntervalStore
      val n1 = s1.addAll(batch1.iterator, gap)
      val (starts, ends) = s1.toArrays // round-trip through persistence
      val s2 = StreamingOps.IntervalStore.from(starts, ends)
      val n2 = s2.addAll(batch2.iterator, gap)
      n1 + n2 == ts.length.toLong &&
        s2.size.toLong == sortedGapSessions(ts, gap)
    })
  }

  test("batch-split merging equals one-shot merging (st12's cross-batch property)") {
    // splitting the event stream at ANY point and seeding the second
    // merge with the first merge's interval store must equal merging
    // everything at once — the invariant that makes transformWithState
    // sessionization correct across micro-batch boundaries
    val gen = for {
      gap <- Gen.chooseNum(1L, 50L)
      ts <- Gen.listOf(Gen.chooseNum(0L, 500L))
      cut <- Gen.chooseNum(0, ts.length)
    } yield (gap, ts, cut)
    check(Prop.forAll(gen) { case (gap, ts, cut) =>
      val (batch1, batch2) = ts.splitAt(cut)
      val iv = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val n1 = StreamingOps.mergeInto(iv, batch1.iterator, gap)
      val n2 = StreamingOps.mergeInto(iv, batch2.iterator, gap)
      n1 + n2 == ts.length.toLong &&
        iv.length.toLong == sortedGapSessions(ts, gap)
    })
  }
}
