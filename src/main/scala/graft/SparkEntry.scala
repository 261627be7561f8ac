package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (SURVEY.md §2): one entry per
  * implemented operator family, each runnable on an sf dir of the
  * driver's star-schema parquet tables. `oracleSql` carries the DuckDB
  * equivalent for the hash-match correctness gate; queries without an
  * entry get a weaker rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The histogram-quantile dashboard aggregate — the reference's
    * semantic heart (SURVEY.md §2 A12-A15, §3 E2). */
  def entry(spark: SparkSession): DataFrame =
    queries("q_a12_hist_quantile")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RelationalQueries.defs ++
      graft.queries.StatsQueries.defs ++
      graft.queries.PipelineQueries.defs ++
      graft.queries.EventQueries.defs ++
      graft.queries.MultimodalQueries.defs ++
      graft.queries.SourceQueries.defs ++
      graft.queries.LookupQueries.defs ++
      graft.queries.ReportQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.RelationalQueries.oracles ++
      graft.queries.StatsQueries.oracles ++
      graft.queries.PipelineQueries.oracles ++
      graft.queries.EventQueries.oracles ++
      graft.queries.MultimodalQueries.oracles ++
      graft.queries.SourceQueries.oracles ++
      graft.queries.LookupQueries.oracles ++
      graft.queries.ReportQueries.oracles
}
