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
      TopKBuffer.fromBytes(k, buf.toBytes).sortedDesc == buf.sortedDesc
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
