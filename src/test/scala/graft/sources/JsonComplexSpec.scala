package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** COMPLEX<json> — Druid's nested-data ("auto") column shape on this
  * engine. Write path: a nested Spark column (struct / map / numeric
  * array) serializes per row to UTF-8 JSON text blobs in a COMPLEX
  * column tagged typeName "json"; a STRING column already holding JSON
  * can be tagged via the `complexTypes` option ("props:json"). Read
  * path: the column surfaces as a JSON STRING that `get_json_object` /
  * `from_json` consume. Documented substitute encoding (JSON text, not
  * Druid's proprietary nested-column field dictionaries); the reference
  * errors on ALL Complex columns (src/column/mod.rs:59-61).
  */
class JsonComplexSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  test("struct column round-trips as COMPLEX<json> and reads as JSON text") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-json").toString + "/t"
    Seq(
      (1700000000000L, 1L, ("mobile", 3L)),
      (1700000001000L, 2L, ("web", 5L)),
      (1700000002000L, 3L, (null: String, 7L)))
      .toDF("__time", "id", "ctx")
      .select(col("__time"), col("id"),
        col("ctx").cast("struct<device:string,clicks:bigint>"))
      .coalesce(1)
      .write.format("druid").mode("overwrite").save(out)

    val back = spark.read.format("druid").load(out)
    // reads back as a STRING column tagged with the json complex type
    assert(back.schema("ctx").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(back.schema("ctx").metadata.getString("druid.complexType") == "json")
    val rows = back.orderBy("id")
      .select(col("id"), col("ctx"),
        get_json_object(col("ctx"), "$.device").as("device"),
        get_json_object(col("ctx"), "$.clicks").cast("long").as("clicks"))
      .collect()
    assert(rows.map(_.getString(1)).toSeq == Seq(
      """{"device":"mobile","clicks":3}""",
      """{"device":"web","clicks":5}""",
      """{"clicks":7}""")) // null fields omitted, like to_json
    assert(rows.map(_.getString(2)).toSeq == Seq("mobile", "web", null))
    assert(rows.map(_.getLong(3)).toSeq == Seq(3L, 5L, 7L))
  }

  test("string column tagged json via complexTypes; nulls survive; filters stay residual") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-json2").toString + "/t"
    Seq(
      (1700000000000L, 1L, """{"k":10}"""),
      (1700000001000L, 2L, """{"k":20}"""),
      (1700000002000L, 3L, null: String))
      .toDF("__time", "id", "props")
      .coalesce(1)
      .write.format("druid").mode("overwrite")
      .option("complexTypes", "props:json")
      .save(out)

    val back = spark.read.format("druid").load(out)
    assert(back.schema("props").metadata.getString("druid.complexType") == "json")
    // a filter on the json column must not engage dictionary pushdown
    // (COMPLEX columns carry no dictionary/bitmaps) — rows still correct
    val f = back.filter(col("props") === """{"k":20}""")
    assert(f.collect().map(_.getAs[Long]("id")).toSeq == Seq(2L))
    val nulls = back.filter(col("props").isNull).collect()
    assert(nulls.map(_.getAs[Long]("id")).toSeq == Seq(3L))
    // get_json_object aggregation over the round-tripped text
    val sum = back.agg(
      org.apache.spark.sql.functions.sum(
        get_json_object(col("props"), "$.k").cast("long"))).collect()
    assert(sum.head.getLong(0) == 30L)
  }

  test("json column projection prunes like any other column") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-json4").toString + "/t"
    Seq((1700000000000L, 1L, ("a", 1L)), (1700000001000L, 2L, ("b", 2L)))
      .toDF("__time", "id", "ctx")
      .select(col("__time"), col("id"),
        col("ctx").cast("struct<k:string,v:bigint>"))
      .coalesce(1)
      .write.format("druid").mode("overwrite").save(out)
    val df = spark.read.format("druid").load(out).select("ctx")
    // the physical scan must read ONLY the json column — at 100 TB a
    // projection that drags every column along is a different query
    val scanCols = df.queryExecution.executedPlan.collectLeaves()
      .head.output.map(_.name)
    assert(scanCols == Seq("ctx"), s"expected pruned scan, got: $scanCols")
    assert(df.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("""{"k":"a","v":1}""", """{"k":"b","v":2}"""))
  }

  test("map and numeric-array columns serialize as json too") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-json3").toString + "/t"
    Seq(
      (1700000000000L, 1L, Map("a" -> 1L), Seq(1.5, 2.5)),
      (1700000001000L, 2L, Map("b" -> 2L), Seq(3.0)))
      .toDF("__time", "id", "m", "xs")
      .coalesce(1)
      .write.format("druid").mode("overwrite").save(out)
    val back = spark.read.format("druid").load(out).orderBy("id")
      .select(col("m"), col("xs")).collect()
    assert(back.map(_.getString(0)).toSeq ==
      Seq("""{"a":1}""", """{"b":2}"""))
    assert(back.map(_.getString(1)).toSeq == Seq("[1.5,2.5]", "[3.0]"))
  }
}
