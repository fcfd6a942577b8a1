package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning

/** Semantic + plan pins for the TimeSeries module (q57–q62) and the
  * st17 update-mode drain. Value correctness is the DuckDB oracle's
  * job; these pin what the oracle can't see — that the gap fill
  * actually fills gaps, that the window queries shuffle exactly once,
  * and that update mode really crossed multiple micro-batches. */
class TimeSeriesSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val sf = SparkSuite.sf

  test("q58 gap fill is non-vacuous: customer 1 has empty months at every SF") {
    val dirs = Seq("sf0.001", "sf0.01", "sf0.1").map("/root/testdata/" + _)
      .filter(new java.io.File(_).exists())
    assert(dirs.nonEmpty, "no fixture dirs found — the pin would be vacuous")
    for (dir <- dirs) {
      val filled = SparkEntry.queries("q58_gap_fill")(spark, dir)
        .filter(col("n_orders") === 0).count()
      assert(filled > 0,
        s"$dir: customer 1 ordered in every corpus month — the spine " +
          "join never zero-fills and the operator under test is idle; " +
          "pick a sparser entity or fixture")
    }
  }

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = PlanWalk.allNodes(p)

  private def hashExchanges(df: org.apache.spark.sql.DataFrame): Seq[SparkPlan] = {
    df.collect()
    allNodes(df.queryExecution.executedPlan).collect {
      case e: ShuffleExchangeLike if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
    }
  }

  test("q57 rolling window shuffles once on the partition key") {
    val df = SparkEntry.queries("q57_rolling_window")(spark, sf)
    // one hash exchange (o_custkey for the window); the only other
    // allowed exchange is the presentation sort's range partitioning
    val ex = hashExchanges(df)
    assert(ex.size == 1,
      s"expected exactly one hash exchange (the window's), got ${ex.size}:\n${ex.mkString("\n")}")
    assert(df.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("q59 forward fill shuffles once on user_id") {
    val df = SparkEntry.queries("q59_forward_fill")(spark, sf)
    val ex = hashExchanges(df)
    assert(ex.size == 1,
      s"expected exactly one hash exchange (the window's), got ${ex.size}:\n${ex.mkString("\n")}")
  }

  test("q82's k boundary is tie-free at every SF (sketch item choice is safe)") {
    // q82's rank re-derivation fixes ORDERING among returned items,
    // but a count tie spanning the k=3 boundary would let
    // approx_top_k return a different ITEM SET than the oracle's
    // (count, item) total order — guard the fixture so that boundary
    // tie fails here with a clear message instead of as a hash
    // mismatch (the q48/q58 fixture-pin pattern)
    val dirs = Seq("sf0.001", "sf0.01", "sf0.1").map("/root/testdata/" + _)
      .filter(new java.io.File(_).exists())
    assert(dirs.nonEmpty, "no fixture dirs found — the pin would be vacuous")
    for (dir <- dirs) {
      val counts = Tables(spark, dir, "events")
        .groupBy(col("event_type")).count()
        .orderBy(col("count").desc, col("event_type"))
        .collect().map(_.getLong(1))
      assert(counts.length <= 3 || counts(2) != counts(3),
        s"$dir: event-type counts tie across the k=3 boundary " +
          s"(${counts.mkString(",")}) — q82's sketch may legally return " +
          "a different 3rd item than the oracle; change k or the fixture")
    }
  }

  test("q75 prefix sum runs over the day aggregate, never the raw fact") {
    // the sweep-line's single-partition window is only acceptable
    // because its input is the ±1-delta-per-DAY aggregate (a few
    // thousand rows at any corpus size); a window whose subtree has no
    // aggregate would be sorting the whole fact in one task
    val df = SparkEntry.queries("q75_concurrency")(spark, sf)
    df.collect()
    val windows = allNodes(df.queryExecution.executedPlan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, "q75 plan lost its window operator")
    for (w <- windows)
      assert(allNodes(w).exists {
        case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
        case _ => false
      }, s"q75 window consumes un-aggregated input:\n$w")
  }

  test("q77 cohort retention reads the fact exactly once") {
    // cohort size is recovered from the offset-0 rollup row by a
    // window — a separate size aggregate would re-execute the whole
    // scan+shuffle subtree (exchanges are not reused across it)
    val df = SparkEntry.queries("q77_cohort_retention")(spark, sf)
    df.collect()
    val scans = allNodes(df.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size == 1,
      s"expected one parquet scan, got ${scans.size}: ${scans.map(_.nodeName)}")
  }

  test("q61 argmax aggregates without a rank window or join-back") {
    val df = SparkEntry.queries("q61_argmax_groups")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"max_by/min_by must run inside the hash aggregate, not a window:\n$plan")
    assert(plan.contains("HashAggregate"), s"expected a hash aggregate:\n$plan")
  }

  test("q57's RANGE frame is not vacuously a ROWS frame on this fixture") {
    // the operator's whole point is day-valued framing: a customer with
    // two orders on one day must count BOTH in each one's trailing
    // window. If no customer ever orders twice in a day, RANGE and ROWS
    // coincide and the frame choice is untested — pin that the fixture
    // keeps the distinction live at every SF.
    val dirs = Seq("sf0.001", "sf0.01", "sf0.1").map("/root/testdata/" + _)
      .filter(new java.io.File(_).exists())
    assert(dirs.nonEmpty, "no fixture dirs found — the pin would be vacuous")
    for (dir <- dirs) {
      val multi = Tables(spark, dir, "orders")
        .groupBy(col("o_custkey"), to_date(col("o_orderdate")).as("day"))
        .count().filter(col("count") > 1).count()
      assert(multi > 0,
        s"$dir: no customer has two same-day orders — q57's RANGE frame " +
          "degenerates to ROWS and the day-valued semantics are untested")
    }
  }

  test("q63's Aggregator is merge-associative and matches the direct formula") {
    // the buffer contract two-phase aggregation relies on: any
    // partition of the input, reduced partially and merged in any
    // grouping, must finish to the same value as the direct computation
    val agg = graft.functions.WeightedMeanAggregator
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 50) {
      val rows = Seq.fill(1 + rnd.nextInt(40))(
        graft.functions.WMIn(1 + rnd.nextInt(50), rnd.nextInt(1000000).toLong))
      val direct = rows.map(r => r.w * r.x).sum.toDouble / rows.map(_.w).sum
      // random chunking into slices of SIZE 1..8 (so up to |rows|
      // slices), each reduced independently, then merged left-to-right
      val slices = rows.grouped(1 + rnd.nextInt(8)).toSeq
      val merged = slices.map(sl => sl.foldLeft(agg.zero)(agg.reduce))
        .reduce(agg.merge)
      assert(agg.finish(merged) == direct) // exact: integer state, one division
    }
    assert(agg.finish(agg.zero).isNaN) // empty-group contract
  }

  test("q67 pages with TakeOrderedAndProject(offset), never a full sort") {
    val df = SparkEntry.queries("q67_pagination")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected the page to plan as TakeOrderedAndProject:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"a global sort crept into the pagination plan:\n$plan")
  }

  test("st17 update mode really crossed multiple micro-batches") {
    // the post-drain result is oracle-checked; this pins that the drain
    // had real work to do — the raw sink must hold MORE rows than keys
    // (at least one key re-emitted by a later batch), otherwise the
    // single-batch accident makes update mode indistinguishable from
    // complete
    SparkEntry.queries("st17_update_mode")(spark, sf).collect()
    val rawSink = spark.table("st17_out")
    val keys = rawSink.select("event_type").distinct().count()
    assert(rawSink.count() > keys,
      s"update-mode sink holds exactly one row per key — the source " +
        "collapsed to a single micro-batch and no update ever happened")
  }
}
