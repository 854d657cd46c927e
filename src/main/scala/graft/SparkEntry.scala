package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator from SURVEY.md §2
  * (plus the scale-extension operators) to a DataFrame pipeline over
  * the testdata tables; `oracleSql` holds the DuckDB twin the driver
  * hash-compares against at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_lineitem")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++ graft.queries.OpsQueries.queries ++
      graft.queries.ExtQueries.queries ++ graft.queries.EvalQueries.queries ++
      graft.queries.StatQueries.queries ++
      graft.queries.ModelQueries.queries ++
      graft.queries.TpchQueries.queries ++
      graft.queries.AnalyticsQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracleSql ++ graft.queries.OpsQueries.oracleSql ++
      graft.queries.ExtQueries.oracleSql ++ graft.queries.EvalQueries.oracleSql ++
      graft.queries.StatQueries.oracleSql ++
      graft.queries.ModelQueries.oracleSql ++
      graft.queries.TpchQueries.oracleSql ++
      graft.queries.AnalyticsQueries.oracleSql
}
