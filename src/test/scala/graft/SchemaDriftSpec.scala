package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.Partitioned

/** Schema evolution across daily snapshots (round-3 verdict gap 1):
  * the reference's full daily re-extract cadence means an upstream
  * ALTER TABLE eventually lands mid-history. The drift-tolerant read
  * must surface pre-drift rows with NULL for the new column, and the
  * one-scan mergeSchema path must agree with the explicit
  * `unionByName(allowMissingColumns = true)` formulation (value
  * parity is q50's DuckDB oracle). */
class SchemaDriftSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val sf = SparkSuite.sf

  test("mergeSchema read equals unionByName(allowMissingColumns) read") {
    val (day1, day2) = Partitioned.ensureDriftSnapshots(spark, sf)
    val merged = Partitioned.driftMergedRead(spark, sf)
    val unioned = spark.read.parquet(day1)
      .unionByName(spark.read.parquet(day2), allowMissingColumns = true)
    assert(merged.schema.fieldNames.sorted.sameElements(
      unioned.schema.fieldNames.sorted))
    val cols = merged.schema.fieldNames.sorted.map(col).toSeq
    assert(merged.select(cols: _*).exceptAll(unioned.select(cols: _*)).isEmpty &&
      unioned.select(cols: _*).exceptAll(merged.select(cols: _*)).isEmpty)
  }

  test("pre-drift rows surface NULL for the drifted column, nothing dropped") {
    val merged = Partitioned.driftMergedRead(spark, sf)
    val base = Tables(spark, sf, "customer")
    val day1Rows = base.count()
    val day2Rows = base.filter(pmod(col("c_custkey"), lit(3)) =!= 0).count()
    assert(merged.count() == day1Rows + day2Rows)
    assert(merged.filter(col("c_mktsegment").isNull).count() == day1Rows)
  }
}
