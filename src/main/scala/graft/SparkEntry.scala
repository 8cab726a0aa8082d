package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl.StarSchema

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's full operator inventory (SURVEY.md §2),
  * one named query per operator; `oracleSql` carries the DuckDB
  * differential oracle for every SQL-expressible one. Column names and
  * row ordering match between the two by construction (every query
  * ends in ORDER BY over a unique key; aggregates are rounded).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    StarSchema.factBuild(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame](
      "etl_fact_build" -> StarSchema.factBuild,
      "etl_dim_build" -> StarSchema.dimBuild,
    ) ++ ops.Relational.queries ++ ops.Functions.queries ++
      ops.TextOps.queries ++ ops.Similarity.queries ++
      ops.Multimodal.queries ++ ops.ScaleOps.queries ++
      ops.Curation.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Map(
      "etl_fact_build" -> StarSchema.factBuildOracle,
      "etl_dim_build" -> StarSchema.dimBuildOracle,
    ) ++ ops.Relational.oracles ++ ops.Functions.oracles ++
      ops.TextOps.oracles ++ ops.Similarity.oracles ++
      ops.Multimodal.oracles ++ ops.ScaleOps.oracles ++
      ops.Curation.oracles
}
