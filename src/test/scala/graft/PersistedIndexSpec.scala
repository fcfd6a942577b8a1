package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.SparkPlan

/** s06's headline claim is serving I/O: a probe over the PERSISTED
  * cell-partitioned index must read only the routed cells'
  * directories. Correctness is the recall gate's job; this pins the
  * pruning actually happens — a regression to a full index scan would
  * stay green on recall while reading nCells/nProbe× the data. */
class PersistedIndexSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val sf = SparkSuite.sf

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = PlanWalk.allNodes(p)

  test("s15 filtered-ANN gate holds and its predicate is non-vacuous") {
    // the permissive-predicate leg's contract: recall ≥ 0.7 vs the
    // exact filtered baseline AND the predicate really rejected
    // over-fetched candidates — without the second half the leg
    // silently degenerates to plain ANN and the gate proves nothing
    val row = graft.operators.Similarity
      .queries("s15_ann_filtered_ivf")(spark, sf).head()
    assert(row.getLong(0) > 0, "exact filtered baseline must be non-empty")
    assert(row.getBoolean(1), "filtered-IVF recall gate must hold")
    assert(row.getBoolean(2),
      "the predicate must reject some over-fetched candidates " +
        "(non-vacuity of the post-filter)")
  }

  test("s06 serving scan is partition-pruned to the routed cells") {
    val served = graft.operators.Similarity.servedProbe(spark, sf)
    served.collect()
    val idxScans = allNodes(served.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(p =>
            p.toString.contains("graft_ivfidx") &&
              p.toString.contains("assigned")) => f
    }
    assert(idxScans.nonEmpty, "no scan of the persisted index found")
    idxScans.foreach { scan =>
      assert(scan.partitionFilters.exists(_.references.exists(_.name == "cell")),
        s"index scan carries no cell partition filter:\n$scan")
      val read = scan.relation.location.listFiles(
        scan.partitionFilters, scan.dataFilters).length
      // 5 queries × 2 probes bound the routed cell set (and 10 < 16
      // cells, so passing implies strict pruning)
      assert(read <= 10, s"expected ≤10 of 16 cell partitions read, got $read")
    }
  }

  test("assignToCells argmin fold equals the windowed argmin exactly") {
    // round-17 rewrite seam: the narrow array_min fold replaced the
    // crossJoin(broadcast)+window formulation; assignment must be
    // BIT-identical (same per-pair double arithmetic, same
    // (dist2 asc, cell asc) tie rule) or persisted segments drift
    // from the quantizer's residency and recall gates go data-
    // dependent. Differential: fold vs the reference window
    // formulation over the full sf embeddings corpus.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val s = spark
    val e = graft.Tables(s, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val (_, cents) = graft.operators.Similarity
      .ivfIndexFor(s, s"$sf#assignSeam", e.filter(col("vec_id") % 5 =!= 0))
    val fold = graft.operators.Similarity.assignToCells(e, cents)
      .select(col("vec_id"), col("cell"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("dist2").asc, col("cell").asc)
    val ref = e.crossJoin(broadcast(cents))
      .withColumn("dist2", expr(
        "aggregate(zip_with(embedding, centroid, " +
          "(x, y) -> CAST(x AS DOUBLE) - CAST(y AS DOUBLE)), 0D, " +
          "(a, v) -> a + v * v)"))
      .withColumn("r", row_number().over(w)).filter(col("r") === 1)
      .select(col("vec_id"), col("cell"))
    assert(fold.exceptAll(ref).isEmpty && ref.exceptAll(fold).isEmpty,
      "fold argmin must assign every vector to the same cell as the " +
        "windowed reference")
  }
}
