package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Differential test for the alternating-star connected-components
  * kernel (d07): random graphs vs a driver-side union-find. Each graph
  * is a full Spark job, so the sample count is modest but seeded —
  * failures reproduce. */
class StarComponentsSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress to the component MIN (roots are minimal by the
    // min-directed union above)
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("starComponents equals union-find on seeded random graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 6) {
      val n = 5 + rnd.nextInt(40)
      val nEdges = rnd.nextInt(2 * n)
      val edges = Seq.fill(nEdges)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val got = Dedup.starComponents(edges.toDF("u", "v"))
          .as[(Long, Long)].collect().toMap
        val want = unionFind(n, edges)
        // starComponents labels only nodes that appear in edges
        val touched = edges.flatMap(e => Seq(e._1, e._2)).toSet
        assert(got.keySet == touched, s"trial $trial node set")
        touched.foreach { node =>
          assert(got(node) == want(node),
            s"trial $trial node $node: got ${got(node)}, want ${want(node)}; edges=$edges")
        }
      }
    }
  }

  test("starComponents handles a long path (diameter stress) and a clique") {
    // path 0-1-2-…-19: one component rooted at 0 — the shape where
    // label propagation needs O(n) rounds and the star algorithm O(log n)
    val path = (0L until 19L).map(i => (i, i + 1))
    val gotPath = Dedup.starComponents(path.toDF("u", "v"))
      .as[(Long, Long)].collect().toMap
    assert(gotPath.values.toSet == Set(0L) && gotPath.size == 20)
    // clique on {10..15} plus an isolated pair
    val clique = for { a <- 10L to 15L; b <- (a + 1) to 15L } yield (a, b)
    val got = Dedup.starComponents((clique :+ (100L, 99L)).toDF("u", "v"))
      .as[(Long, Long)].collect().toMap
    assert((10L to 15L).forall(got(_) == 10L))
    assert(got(99L) == 99L && got(100L) == 99L)
  }
}
