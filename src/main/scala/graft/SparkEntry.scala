package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module operator registries. Every `queries` entry
  * is a named declarative DataFrame program; `oracleSql` carries the
  * DuckDB-equivalent ANSI SQL for the differential correctness gate
  * (omitted only for sketch/hash-dependent operators, which get the
  * weaker rows-only check).
  */
object SparkEntry {

  /** Flagship query (reference `spark_process_script.py:35-39` shape) on
    * sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_crime_flagship")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
      operators.TimeSeries.queries ++
      operators.Behavioral.queries ++
      operators.HigherOrder.queries ++
      operators.Dedup.queries ++
      operators.Similarity.queries ++
      operators.SimilarityGraph.queries ++
      operators.TextOps.queries ++
      operators.Multimodal.queries ++
      operators.ChangeCapture.queries ++
      operators.Graph.queries ++
      operators.Geo.queries ++
      operators.Fuzz.queries ++
      operators.FuzzExt.queries ++
      sources.Bucketing.queries ++
      sources.Formats.queries ++
      sources.Partitioned.queries ++
      sources.Compaction.queries ++
      sources.SeqSourceQueries.queries ++
      sources.RowCatalogQueries.queries ++
      sources.AggSinkQueries.queries ++
      sources.AvroQueries.queries ++
      sources.SpjQueries.queries ++
      sources.DmlFuzz.queries ++
      plans.Adaptive.queries ++
      plans.RuntimeFilter.queries ++
      streaming.StreamingOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++
      operators.TimeSeries.oracles ++
      operators.Behavioral.oracles ++
      operators.HigherOrder.oracles ++
      operators.Dedup.oracles ++
      operators.Similarity.oracles ++
      operators.SimilarityGraph.oracles ++
      operators.TextOps.oracles ++
      operators.Multimodal.oracles ++
      operators.ChangeCapture.oracles ++
      operators.Graph.oracles ++
      operators.Geo.oracles ++
      operators.Fuzz.oracles ++
      operators.FuzzExt.oracles ++
      sources.Bucketing.oracles ++
      sources.Formats.oracles ++
      sources.Partitioned.oracles ++
      sources.Compaction.oracles ++
      sources.SeqSourceQueries.oracles ++
      sources.RowCatalogQueries.oracles ++
      sources.AggSinkQueries.oracles ++
      sources.AvroQueries.oracles ++
      sources.SpjQueries.oracles ++
      sources.DmlFuzz.oracles ++
      plans.Adaptive.oracles ++
      plans.RuntimeFilter.oracles ++
      streaming.StreamingOps.oracles
}
