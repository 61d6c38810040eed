package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private def sets: Seq[QuerySet] =
    Seq(Relational, DruidQueries, PipelineQueries, StreamingQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Round-trips lineitem through the segment writer + DSv2 connector.
    */
  def entry(spark: SparkSession): DataFrame =
    DruidQueries.queries("dr3_lineitem_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    sets.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    sets.flatMap(_.oracles).toMap
}
