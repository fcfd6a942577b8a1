package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Storage-partitioned scan contract (q90/q91): the connector's
  * declared KeyGroupedPartitioning must actually ELIMINATE the
  * exchanges — and the pin must be non-vacuous, so the same plans are
  * also built with v2 bucketing OFF and asserted to shuffle. Results
  * must be identical either way (the flag moves data, never answers).
  */
class SpjSourceSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  private def spj(groups: Int, rowsPerGroup: Long, mult: Long) =
    spark.read.format("graft.sources.SpjSourceProvider")
      .option("groups", groups.toString)
      .option("rowsPerGroup", rowsPerGroup.toString)
      .option("mult", mult.toString)
      .load()

  /** Count shuffles in the EXECUTED plan (AQE-final). */
  private def shuffles(df: DataFrame): Int = {
    df.collect() // materialize so AQE finalizes every stage
    PlanWalk.allNodes(df.queryExecution.executedPlan)
      .count(_.isInstanceOf[ShuffleExchangeExec])
  }

  private def withBucketing[A](on: Boolean)(body: => A): A = {
    val key = "spark.sql.sources.v2.bucketing.enabled"
    val before = spark.conf.getOption(key)
    spark.conf.set(key, on.toString)
    try body
    finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  private def aggShape: DataFrame =
    spj(64, 2000L, 48271L).groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("amt")).as("sum_amt"))

  private def joinShape: DataFrame = {
    val fact = spj(64, 2000L, 48271L)
      .groupBy(col("grp")).agg(sum(col("amt")).as("fact_amt"))
    val dim = spj(64, 500L, 69621L)
      .groupBy(col("grp")).agg(sum(col("amt")).as("dim_amt"))
    fact.join(dim, "grp")
      .select(col("grp"), (col("fact_amt") + col("dim_amt")).as("total"))
  }

  test("grouped aggregate on the partition key plans zero shuffles") {
    val on = withBucketing(on = true)(shuffles(aggShape))
    assert(on == 0, s"SPJ aggregate still shuffles ($on exchanges)")
    // non-vacuous: the same plan WITHOUT the declared layout shuffles
    val off = withBucketing(on = false)(shuffles(aggShape))
    assert(off >= 1, "conf-off aggregate plan has no shuffle — pin is vacuous")
  }

  test("co-partitioned join plans zero shuffles on either side") {
    val on = withBucketing(on = true)(shuffles(joinShape))
    assert(on == 0, s"storage-partitioned join still shuffles ($on exchanges)")
    val off = withBucketing(on = false)(shuffles(joinShape))
    assert(off >= 2, s"conf-off join should shuffle both sides, saw $off")
  }

  test("the flag changes plans, never results") {
    val on = withBucketing(on = true)(
      joinShape.orderBy(col("grp")).collect().toSeq)
    val off = withBucketing(on = false)(
      joinShape.orderBy(col("grp")).collect().toSeq)
    assert(on == off)
    assert(on.size == 64)
  }

  test("column pruning reaches the reader") {
    val pruned = spj(4, 10L, 48271L).select(col("amt"))
    val scanSchemas = PlanWalk.allNodes(pruned.queryExecution.executedPlan)
      .collect { case s if s.nodeName.contains("BatchScan") => s.output.map(_.name) }
    assert(scanSchemas.nonEmpty && scanSchemas.forall(_ == Seq("amt")),
      s"reader not pruned: $scanSchemas")
  }
}
