package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, CoreQueries, ExtQueries, GraphQueries, MiningQueries, TpchQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-package query registries; every entry has a DuckDB
  * oracle twin unless the operator is not SQL-expressible.
  */
object SparkEntry {

  /** Flagship query (SURVEY §7.3 end-to-end medallion slice) on sf0.001;
    * driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.queries("q_pipeline_e2e")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ ExtQueries.queries ++ AnalyticsQueries.queries ++
      TpchQueries.queries ++ MiningQueries.queries ++ GraphQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    CoreQueries.oracleSql ++ ExtQueries.oracleSql ++ AnalyticsQueries.oracleSql ++
      TpchQueries.oracleSql ++ MiningQueries.oracleSql ++ GraphQueries.oracleSql
}
