package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** s06's headline claim is serving I/O: a probe over the PERSISTED
  * cell-partitioned index must read only the routed cells'
  * directories. Correctness is the recall gate's job; this pins the
  * pruning actually happens — a regression to a full index scan would
  * stay green on recall while reading nCells/nProbe× the data. */
class PersistedIndexSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val sf = SparkSuite.sf

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val inner = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case r: ReusedExchangeExec    => Seq(r.child)
      case _                        => Nil
    }
    p +: (p.children ++ inner ++ p.subqueries).flatMap(allNodes)
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
      // 16 cells exist; 5 queries × 2 probes bound the routed set, and
      // routing must strictly prune (10 < 16 even if every probe were
      // distinct)
      assert(read <= 10 && read < 16,
        s"expected ≤10 of 16 cell partitions read, got $read")
    }
  }
}
