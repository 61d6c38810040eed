package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The pure-SQL surface over the connector: CREATE TABLE ... USING
  * druid, INSERT INTO (append + overwrite), and SELECT — no DataFrame
  * code at all. This is how a SQL-only user (or a JDBC gateway) would
  * drive segment tables.
  */
class SqlDdlSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  test("CREATE TABLE USING druid + INSERT + SELECT round-trip") {
    val dir = Files.createTempDirectory("graft-ddl").toString + "/t"
    spark.sql("DROP TABLE IF EXISTS ddl_events")
    spark.sql(
      s"""CREATE TABLE ddl_events (__time TIMESTAMP, kind STRING, n BIGINT)
         |USING druid OPTIONS (path '$dir')""".stripMargin)
    spark.sql(
      """INSERT INTO ddl_events
        |SELECT timestamp_millis(1700000000000 + id * 1000), concat('k', id % 3), id
        |FROM range(0, 300)""".stripMargin)
    val total = spark.sql("SELECT count(*) FROM ddl_events").head().getLong(0)
    assert(total == 300)
    val byKind = spark.sql(
      "SELECT kind, count(*) AS c, sum(n) AS s FROM ddl_events GROUP BY kind ORDER BY kind")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(byKind.length == 3 && byKind.forall(_._2 == 100))
    assert(byKind.map(_._3).sum == (0L until 300).sum)

    // append accumulates segments; overwrite truncates
    spark.sql(
      """INSERT INTO ddl_events
        |SELECT timestamp_millis(1700001000000), 'extra', 999 FROM range(0, 1)""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM ddl_events").head().getLong(0) == 301)
    spark.sql(
      """INSERT OVERWRITE ddl_events
        |SELECT timestamp_millis(1700000000000 + id), 'only', id FROM range(0, 7)""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM ddl_events").head().getLong(0) == 7)
    assert(spark.sql("SELECT DISTINCT kind FROM ddl_events").count() == 1)
    spark.sql("DROP TABLE ddl_events")
  }

  test("filters and pruning work through the SQL surface") {
    val dir = Files.createTempDirectory("graft-ddl2").toString + "/t"
    spark.sql("DROP TABLE IF EXISTS ddl_zone")
    spark.sql(
      s"""CREATE TABLE ddl_zone (__time TIMESTAMP, n BIGINT)
         |USING druid OPTIONS (path '$dir')""".stripMargin)
    spark.sql(
      """INSERT INTO ddl_zone
        |SELECT timestamp_millis(1700000000000 + id), id
        |FROM range(0, 4000) DISTRIBUTE BY CAST(id / 1000 AS INT)""".stripMargin)
    val filtered = spark.sql("SELECT count(*) FROM ddl_zone WHERE n BETWEEN 100 AND 199")
    assert(filtered.head().getLong(0) == 100)
    spark.sql("DROP TABLE ddl_zone")
  }
}
