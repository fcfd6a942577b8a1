package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table utilities (builder-prompt "bucketing for co-located
  * joins").
  *
  * Writing both sides of a recurring fact-fact join bucketed by the
  * join key (same bucket count) lets Spark plan the join with ZERO
  * exchanges: each bucket pair joins locally. On a 100 TB fact table
  * joined daily, pre-bucketing converts every run's full-table shuffle
  * into a scan — the shuffle is paid once at write time.
  *
  * Bucketing requires the catalog (`saveAsTable`); plain
  * `.parquet(path)` writes cannot carry bucket metadata.
  */
object Bucketing {

  /** Write `df` as a bucketed, catalog-registered table. */
  def writeBucketed(df: DataFrame, db: String, table: String,
      bucketCol: String, nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    df.sparkSession.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val w = df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(nBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(s"$db.$table")
  }

  /** Join two same-bucketed tables on the bucket key — plans with no
    * Exchange on either side (see BucketingSpec's plan assertion). */
  def coLocatedJoin(spark: SparkSession, db: String, left: String,
      right: String, leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(s"$db.$left")
    val r = spark.table(s"$db.$right")
    l.join(r, l(leftKey) === r(rightKey))
  }
}
