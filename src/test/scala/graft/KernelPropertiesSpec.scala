package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TopKBuffer

/** Property tests for the pure kernels behind the custom Catalyst
  * surface — no SparkSession needed, so these run in milliseconds and
  * cover the randomized edge cases the example-based specs can't. */
class KernelPropertiesSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private val entryGen: Gen[(Double, Long)] = for {
    o <- Gen.chooseNum(-1e6, 1e6)
    p <- Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)
  } yield (o, p)

  test("TopKBuffer equals sort-based top-k for random inputs") {
    check(Prop.forAll(Gen.chooseNum(1, 20), Gen.listOf(entryGen)) { (k, xs) =>
      val buf = new TopKBuffer(k)
      xs.foreach { case (o, p) => buf.insert(o, p) }
      val expected = xs.sortBy { case (o, p) => (-o, p) }.take(k)
      buf.sortedDesc == expected
    })
  }

  test("TopKBuffer merge equals top-k of the union") {
    check(Prop.forAll(Gen.chooseNum(1, 10), Gen.listOf(entryGen),
      Gen.listOf(entryGen)) { (k, xs, ys) =>
      val b1 = new TopKBuffer(k); xs.foreach { case (o, p) => b1.insert(o, p) }
      val b2 = new TopKBuffer(k); ys.foreach { case (o, p) => b2.insert(o, p) }
      b2.foreach((o, p) => b1.insert(o, p))
      val expected = (xs ++ ys).sortBy { case (o, p) => (-o, p) }.take(k)
      b1.sortedDesc == expected
    })
  }

  test("TopKBuffer serialization round-trips") {
    check(Prop.forAll(Gen.chooseNum(1, 10), Gen.listOf(entryGen)) { (k, xs) =>
      val buf = new TopKBuffer(k)
      xs.foreach { case (o, p) => buf.insert(o, p) }
      TopKBuffer.fromBytes(k, distinctPayload = false, buf.toBytes)
        .sortedDesc == buf.sortedDesc
    })
  }

  test("distinct-payload TopKBuffer equals top-k over distinct payloads") {
    // duplicates carry the SAME ord per payload (the aggregate's usage
    // contract: ord is a pure function of the payload pair)
    check(Prop.forAll(Gen.chooseNum(1, 10),
      Gen.listOf(Gen.chooseNum(0L, 20L))) { (k, pays) =>
      def ordOf(p: Long): Double = math.sin(p.toDouble) // deterministic
      val buf = new TopKBuffer(k, distinctPayload = true)
      pays.foreach(p => buf.insert(ordOf(p), p))
      val expected = pays.distinct.map(p => (ordOf(p), p))
        .sortBy { case (o, p) => (-o, p) }.take(k)
      buf.sortedDesc == expected
    })
  }

  test("distinct-payload merge of disjoint partials equals union top-k") {
    check(Prop.forAll(Gen.chooseNum(1, 10),
      Gen.listOf(Gen.chooseNum(0L, 20L)), Gen.listOf(Gen.chooseNum(0L, 20L))) {
      (k, xs, ys) =>
        def ordOf(p: Long): Double = math.cos(p.toDouble)
        val b1 = new TopKBuffer(k, distinctPayload = true)
        xs.foreach(p => b1.insert(ordOf(p), p))
        val b2 = new TopKBuffer(k, distinctPayload = true)
        ys.foreach(p => b2.insert(ordOf(p), p))
        b2.foreach((o, p) => b1.insert(o, p))
        val expected = (xs ++ ys).distinct.map(p => (ordOf(p), p))
          .sortBy { case (o, p) => (-o, p) }.take(k)
        b1.sortedDesc == expected
    })
  }

  test("TopKBuffer ties on ord resolve to smallest payloads") {
    val buf = new TopKBuffer(2)
    Seq((1.0, 5L), (1.0, 3L), (1.0, 9L), (1.0, 1L)).foreach {
      case (o, p) => buf.insert(o, p)
    }
    assert(buf.sortedDesc == Seq((1.0, 1L), (1.0, 3L)))
  }
}
