package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamFuzz

/** The randomized streaming differential sweep: seeded chunked inputs
  * streamed one file per micro-batch through drawn watermark-free
  * computations — every drain must equal the same program run as one
  * batch AND the plain-Scala model fold. The pinned st42/st43 rows'
  * draw shapes are asserted here so a generator drift trips BEFORE
  * the driver's hash gate (the DmlFuzz discipline). */
class StreamFuzzSpec extends AnyFunSuite {

  private val Seeds: Range = 1 to 40

  test("40 seeded chunked streams: drain == batch == model") {
    val s = SparkSuite.spark
    var shapes = Map.empty[String, Int].withDefaultValue(0)
    var modes = Map.empty[String, Int].withDefaultValue(0)
    for (seed <- Seeds) {
      val p = StreamFuzz.draw(seed.toLong)
      shapes = shapes.updated(p.shape, shapes(p.shape) + 1)
      modes = modes.updated(p.mode, modes(p.mode) + 1)
      val (batches, _) = StreamFuzz.run(s, seed.toLong, "sweep")
      // one file per trigger over >= 2 chunks: the consistency claim
      // is vacuous unless the state really crossed batch boundaries
      assert(batches >= p.chunks,
        s"seed $seed: expected >= ${p.chunks} micro-batches, " +
          s"got $batches")
    }
    // coverage floor: the sweep must keep exercising every shape and
    // both stateful output modes
    for (sh <- Seq("agg", "stateless", "join", "dedup"))
      assert(shapes(sh) >= 2, s"shape $sh underdrawn: $shapes")
    assert(modes("complete") >= 4 && modes("update") >= 4,
      s"output modes underdrawn: $modes")
  }

  test("pinned st42/st43: shapes stable, finals non-trivial") {
    val p42 = StreamFuzz.draw(StreamFuzz.Pinned(0)._2)
    assert(p42.shape == "agg" && p42.mode == "update" && p42.chunks >= 3,
      s"st42 must pin the stateful update shape, drew ${p42.desc}")
    val p43 = StreamFuzz.draw(StreamFuzz.Pinned(1)._2)
    assert(p43.shape == "stateless" && p43.filterC.nonEmpty,
      s"st43 must pin a filtered stateless append, drew ${p43.desc}")
    assert(StreamFuzz.model(p42).nonEmpty &&
      StreamFuzz.model(p43).size >= 10,
      "pinned finals must be non-trivial — an empty hash gate checks " +
        "nothing")
    // oracle SQL renders and stays non-empty
    assert(StreamFuzz.pinnedOracle(StreamFuzz.Pinned(0)._2)
      .startsWith("SELECT"))
  }
}
