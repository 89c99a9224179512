package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator group into the `queries`/`oracleSql` maps the
  * driver's correctness gate (Verify → DuckDB compare) and Bench consume.
  */
object SparkEntry {

  /** All operator definitions, grouped by module. */
  def defs: Seq[QueryDef] =
    Relational.all ++ PipelineQueries.all ++
      Dedup.all ++ Similarity.all ++ TextAnalysis.all ++ MultimodalQueries.all ++
      Sources.all ++ UdfQueries.all ++ SimilarityJoin.all ++ ScaleTechniques.all ++
      TrainingDataOps.all ++ Cdc.all ++ Compaction.all ++ Profiling.all ++
      GraphOps.all ++ EventAnalytics.all ++ Statistics.all ++
      graft.streaming.StreamingQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q07_region_nation_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.flatMap(q => q.oracle.map(o => q.name -> o.stripMargin.trim)).toMap
}
