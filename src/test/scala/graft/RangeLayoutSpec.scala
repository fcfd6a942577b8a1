package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.Partitioned

/** The q52 layout contract: repartitionByRange + sortWithinPartitions
  * must yield near-disjoint per-file shipdate ranges (that is what
  * parquet footer min/max skipping keys on) and the range filter must
  * reach the scan as a pushed filter. Row-level value parity is the
  * q52 DuckDB oracle's job. */
class RangeLayoutSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val sf = SparkSuite.sf

  test("each output file covers a narrow slice of the global date range") {
    val dir = Partitioned.ensureRangeSorted(spark, sf)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length > 4, s"expected a multi-file layout, got ${files.length}")
    val spans = files.map { f =>
      // l_shipdate is TIMESTAMP_NTZ; unix_micros needs TIMESTAMP
      val us = unix_micros(col("l_shipdate").cast("timestamp"))
      val r = spark.read.parquet(f).agg(min(us), max(us)).head()
      (r.getLong(0), r.getLong(1))
    }
    val globalSpan = spans.map(_._2).max - spans.map(_._1).min
    spans.foreach { case (lo, hi) =>
      // 16 range partitions over the corpus: each file must span well
      // under half the global range or footer-stats skipping is dead
      assert((hi - lo) * 2 < globalSpan,
        s"file spans ${hi - lo} of $globalSpan us: range layout broken")
    }
    // near-disjoint: total covered time ≈ global span (files don't all
    // overlap the same region)
    val covered = spans.map { case (lo, hi) => hi - lo }.sum
    assert(covered < globalSpan * 2,
      s"files overlap heavily: $covered covered vs $globalSpan global")
  }

  test("the date-range predicate is pushed to the parquet scan") {
    import org.apache.spark.sql.execution.SparkPlan
    def allNodes(p: SparkPlan): Seq[SparkPlan] = PlanWalk.allNodes(p)
    val df = SparkEntry.queries("q52_range_layout")(spark, sf)
    df.collect()
    val scans = allNodes(df.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "no parquet scan found in the executed plan")
    val pushed = scans.flatMap(_.metadata.get("PushedFilters")).mkString
    assert(pushed.contains("l_shipdate"),
      s"no pushed shipdate filter in scan metadata: $pushed")
  }
}
