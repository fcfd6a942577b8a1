package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Alternate columnar format coverage: the engine's sink/source surface
  * is not parquet-only. q40 pushes a fact slice through a PARTITIONED
  * ORC round trip — write with `partitionBy`, read the directory tree
  * back, aggregate — and the oracle states the same aggregate over the
  * original parquet, so the check covers type fidelity (doubles,
  * strings, partition-column recovery) across the format boundary.
  * ORC ships with Spark; the same `.format(...)` swap is all a user
  * changes at 100 TB.
  */
object Formats {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_orc_roundtrip" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_orc/$tag"
      graft.Tables(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity"), col("l_extendedprice"))
        .write.mode("overwrite")
        .partitionBy("l_returnflag")
        .orc(out)
      s.read.orc(out)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(LongType)).as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    })
  )

  val oracles: Map[String, String] = Map(
    // stated over the ORIGINAL parquet table: the ORC round trip must
    // be lossless for the aggregate to hash-match
    "q40_orc_roundtrip" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
