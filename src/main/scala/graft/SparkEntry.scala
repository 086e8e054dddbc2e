package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 is represented by one or more entries in
  * [[queries]] (the Spark pipeline) paired, where ANSI-SQL-expressible, with
  * a DuckDB oracle in [[oracleSql]]. Non-SQL-expressible operators (streaming
  * state, raster byte transforms, LSH internals) are covered by ScalaTest
  * specs under src/test and registered here as rows-only checks.
  */
object SparkEntry {

  /** The full registry, grouped by theme. */
  def registry: Seq[GraftQuery] =
    Relational.all ++ Temporal.all ++ GeoQueries.all ++ Scalar.all ++
      DslQueries.all ++ LlmPipeline.all ++ IngestQueries.all ++ RasterQueries.all ++
      SinkJoinQueries.all ++ SourceQueries.all ++ WindowFilterQueries.all ++
      ScalarPackQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
