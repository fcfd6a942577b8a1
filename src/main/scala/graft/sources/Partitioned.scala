package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Hive-style partitioned copies + dynamic partition pruning (DPP).
  *
  * The reference's at-rest layout is date-partitioned parquet
  * (`/root/reference/spark_ingest_script.py:87` `partitionBy(y,m,d)`),
  * and the 100 TB payoff of that layout is PARTITION ELIMINATION: a
  * star-schema query whose dim-side filter implies "only these fact
  * partitions matter" should read only those directories. A static
  * filter prunes at plan time; when the filter arrives through a JOIN,
  * Spark's dynamic partition pruning executes the (broadcast) dim side
  * first and injects the observed key set as a runtime partition filter
  * into the fact scan — `PartitionFilters: [dynamicpruningexpression(...)]`
  * (asserted in PartitionedSpec). On a 7-year corpus filtered to 2
  * years, 5/7 of the fact I/O never happens; at 100 TB that is the
  * difference between a 2-year scan and a full-history scan.
  */
object Partitioned {

  /** Once-per-session ship-year-partitioned copy of lineitem (the write
    * is the amortized at-rest layout cost, as with Bucketing's copies;
    * per-applicationId scratch path, see [[graft.Scratch]]). */
  private[graft] def ensureShipYearCopy(s: SparkSession, d: String): String = {
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    val out = graft.Scratch.dir(s, "graft_part", tag)
    if (!new java.io.File(s"$out/_SUCCESS").exists()) {
      graft.Tables(s, d, "lineitem")
        .withColumn("l_shipyear", year(col("l_shipdate")).cast(IntegerType))
        .write.mode("overwrite").partitionBy("l_shipyear").parquet(out)
    }
    out
  }

  /** The DPP join: fact partitioned by ship year, dim = the distinct
    * order years with a selective predicate. Kept as a method so the
    * spec can assert the runtime partition filter on the exact plan the
    * query runs. */
  private[graft] def dppJoin(s: SparkSession, d: String): DataFrame = {
    val fact = s.read.parquet(ensureShipYearCopy(s, d))
    val dim = graft.Tables(s, d, "orders")
      .select(year(col("o_orderdate")).cast(IntegerType).as("y")).distinct()
      .filter(col("y").between(1996, 1997))
    fact.join(dim, fact("l_shipyear") === dim("y"))
      .groupBy(col("l_shipyear"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast(LongType)).as("sum_qty"))
      .orderBy(col("l_shipyear"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q42_dpp_join" -> ((s, d) => dppJoin(s, d))
  )

  val oracles: Map[String, String] = Map(
    // the partitioned copy must not change the answer: the oracle is the
    // same join over the flat table
    "q42_dpp_join" ->
      """WITH dim AS (SELECT DISTINCT CAST(year(o_orderdate) AS INTEGER) AS y
        |             FROM orders WHERE year(o_orderdate) BETWEEN 1996 AND 1997)
        |SELECT CAST(year(l_shipdate) AS INTEGER) AS l_shipyear,
        |  COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem JOIN dim ON CAST(year(l_shipdate) AS INTEGER) = y
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
