package graft

import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the table-loader contract against driver testdata regeneration:
  * whatever physical annotation the parquet carries (nanos-as-long,
  * tz-less micros → TIMESTAMP_NTZ, or micros-UTC), every timestamp-ish
  * column must arrive as TimestampType, because `unix_micros` and
  * `withWatermark` reject NTZ at analysis — the round-3 regression that
  * silently broke six queries.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").filter(d =>
      new java.io.File(d).isDirectory)

  test("no table surfaces a TIMESTAMP_NTZ column through Tables") {
    for (dir <- dirs; name <- Tables.names) {
      val df =
        if (name == "events") Tables.events(spark, dir)
        else Tables.load(spark, dir, name)
      val ntz = df.schema.fields.filter(_.dataType == TimestampNTZType)
      assert(ntz.isEmpty,
        s"$dir/$name still exposes NTZ columns: ${ntz.map(_.name).mkString(",")}")
    }
  }

  test("known timestamp columns arrive as TimestampType") {
    val expect = Seq(
      ("events", "ts", true), ("orders", "o_orderdate", false),
      ("lineitem", "l_shipdate", false))
    for (dir <- dirs; (table, colName, viaEvents) <- expect) {
      val df =
        if (viaEvents) Tables.events(spark, dir)
        else Tables.load(spark, dir, table)
      assert(df.schema(colName).dataType == TimestampType,
        s"$dir/$table.$colName is ${df.schema(colName).dataType}, want TimestampType")
    }
  }

  test("normalized events.ts survives unix_micros and a watermark") {
    import org.apache.spark.sql.functions._
    for (dir <- dirs) {
      val df = Tables.events(spark, dir)
      // unix_micros rejects NTZ at analysis — this fails loudly if the
      // loader ever regresses
      assert(df.select(unix_micros(col("ts"))).limit(1).count() >= 0)
    }
  }
}
