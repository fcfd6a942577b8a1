package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.Partitioned

/** The q54 layout contract: bit-interleaving (l_shipdate, l_partkey)
  * into the sort key must bound every file's extent in BOTH dimensions
  * — the property footer-stats skipping keys on, and exactly what a
  * plain single-column sort cannot deliver (a shipdate-sorted file
  * spans every partkey). Row-level value parity is the q54 DuckDB
  * oracle's job. */
class ZOrderLayoutSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val sf = SparkSuite.sf

  test("narrow predicates in EACH dimension skip files by footer stats") {
    val dir = Partitioned.ensureZOrdered(spark, sf)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length > 8, s"expected a multi-file layout, got ${files.length}")
    // per-file [min,max] in each dimension — what a parquet footer
    // holds (l_shipdate reads back TIMESTAMP_NTZ; unix_micros needs
    // TIMESTAMP, the RangeLayoutSpec pattern)
    val us = unix_micros(col("l_shipdate").cast("timestamp"))
    val spans = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(us), max(us), min(col("l_partkey")), max(col("l_partkey")))
        .head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    def overlapDate(lo: Long, hi: Long) =
      spans.count { case (a, b, _, _) => a <= hi && b >= lo }
    def overlapPart(lo: Long, hi: Long) =
      spans.count { case (_, _, a, b) => a <= hi && b >= lo }
    def micros(day: String) =
      java.time.LocalDate.parse(day).toEpochDay * 86400L * 1000000L
    // two independent single-dim predicates (the q54 box shape): each
    // must prune a strict majority of files or the interleave is broken
    // in that dimension (a pure date sort leaves partkey overlap at
    // 100%). The part window is 10% of the ACTUAL key domain so the
    // check stays non-vacuous at every SF's cardinality.
    val dateHit = overlapDate(micros("1997-01-01"), micros("1997-07-01") - 1)
    val (pMin, pMax) = (spans.map(_._3).min, spans.map(_._4).max)
    val w = pMax - pMin + 1
    val partHit = overlapPart(pMin + 3 * w / 10, pMin + 4 * w / 10 - 1)
    assert(dateHit * 2 < files.length,
      s"date range hits $dateHit of ${files.length} files: no date locality")
    assert(partHit * 2 < files.length,
      s"part range hits $partHit of ${files.length} files: no part locality")
  }

  test("both box predicates are pushed to the parquet scan") {
    import org.apache.spark.sql.execution.SparkPlan
    def allNodes(p: SparkPlan): Seq[SparkPlan] = PlanWalk.allNodes(p)
    val df = SparkEntry.queries("q54_zorder_layout")(spark, sf)
    df.collect()
    val pushed = allNodes(df.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metadata.getOrElse("PushedFilters", "")
    }.mkString
    assert(pushed.contains("l_shipdate") && pushed.contains("l_partkey"),
      s"both dimensions must reach the scan as pushed filters: $pushed")
  }
}
