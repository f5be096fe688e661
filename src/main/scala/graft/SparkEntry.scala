package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query registries. Every key has a DuckDB
  * oracle in [[oracleSql]] unless the operator is not SQL-expressible
  * (noted per module), in which case the driver records a rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("join_natural_5way")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.entries ++
      graft.queries.Lifecycle.entries ++
      graft.queries.BookOrdersKeys.entries ++
      graft.queries.Extras.entries ++
      graft.ext.TextOps.entries ++
      graft.ext.Dedup.entries ++
      graft.ext.Similarity.entries ++
      graft.ext.EventOps.entries ++
      graft.ext.Multimodal.entries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.Lifecycle.oracles ++
      graft.queries.BookOrdersKeys.oracles ++
      graft.queries.Extras.oracles ++
      graft.ext.TextOps.oracles ++
      graft.ext.Dedup.oracles ++
      graft.ext.Similarity.oracles ++
      graft.ext.EventOps.oracles ++
      graft.ext.Multimodal.oracles
}
