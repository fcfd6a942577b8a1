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
}
