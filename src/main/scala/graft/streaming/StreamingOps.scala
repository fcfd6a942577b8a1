package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §2.9).
  *
  * The reference approximates a stream with scheduled full-snapshot
  * batches (Airflow `@daily`, `da-capstone-emr-airflow.py:94`); the
  * Spark-native equivalent is a file-source stream with
  * `Trigger.AvailableNow` — process everything that has arrived, then
  * stop — which is exactly the daily-batch topology, minus the cluster
  * lifecycle. At scale the same query runs continuously with a real
  * trigger and checkpointing; nothing in the plan changes.
  *
  * st01 runs a tumbling-window aggregation as a genuine streaming query
  * (memory sink, drained synchronously so the driver contract can treat
  * it like any batch query) and is oracle-checked against the batch
  * equivalent — the streaming/batch unification Spark promises.
  */
object StreamingOps {

  // events.parquet carries TIMESTAMP(NANOS); streaming reads need the
  // same nanosAsLong + integer ns→µs conversion as graft.Tables.
  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos-as-long
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── st01: tumbling 1-hour window aggregation over the event stream.
    "st01_stream_hourly" -> ((s, d) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // file-source streams want a directory basePath; a glob that
      // matches exactly events.parquet keeps the source scoped to the
      // one table while satisfying that contract.
      val stream = s.readStream
        .schema(eventsSchema)
        .parquet(s"$d/events.parque[t]")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      val agg = stream
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n"), col("sum_value"))
      val sinkName = "st01_out"
      val q = agg.writeStream
        .format("memory")
        .queryName(sinkName)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(sinkName)
        .orderBy(col("window_start"), col("event_type"))
    })
  )

  val oracles: Map[String, String] = Map(
    "st01_stream_hourly" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
