package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine capability: a Spark-first builder plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle SQL
  * over the same parquet tables. Column names/aliases MUST match between
  * the two — the driver's compare sorts columns by name before hashing.
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QuerySet {
  def all: Seq[Q]
  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap
  final def oracles: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
