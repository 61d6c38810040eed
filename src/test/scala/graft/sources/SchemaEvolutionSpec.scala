package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.druid.{DruidTableUtil, SegmentCatalog}

/** Schema evolution across segments: a 100 TB table's segments
  * accumulate columns over time. The table schema is the union, old
  * segments read the new columns as null, and a same-name type clash
  * fails the append before anything moves.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  private def freshDir(): String =
    Files.createTempDirectory("graft-evo").toString + "/t"

  test("appended segments with new columns read as a union schema") {
    import spark.implicits._
    val dir = freshDir()
    (0 until 100).map(i => (1700000000000L + i, i.toLong))
      .toDF("__time", "a").coalesce(1)
      .write.format("druid").mode("overwrite").save(dir)
    (100 until 200).map(i => (1700000000000L + i, i.toLong, s"v$i", i * 0.5))
      .toDF("__time", "a", "b", "c").coalesce(1)
      .write.format("druid").mode("append").save(dir)

    val df = spark.read.format("druid").load(dir)
    assert(df.columns.toSeq == Seq("__time", "a", "b", "c"))
    assert(df.count() == 200)
    // old segment contributes nulls for b and c
    assert(df.filter(col("b").isNull).count() == 100)
    assert(df.filter(col("c").isNull).count() == 100)
    // values from the new segment intact, filters work across both
    assert(df.filter(col("b") === "v150").count() == 1)
    assert(df.select(sum(col("a"))).head().getLong(0) == (0 until 200).map(_.toLong).sum)
    // aggregation over the evolved column ignores the null rows
    assert(df.select(count(col("c"))).head().getLong(0) == 100)
  }

  test("union schema is cached in the manifest (no segment opens)") {
    import spark.implicits._
    val dir = freshDir()
    (0 until 10).map(i => (1700000000000L + i, i.toLong))
      .toDF("__time", "a").coalesce(1)
      .write.format("druid").mode("overwrite").save(dir)
    (0 until 10).map(i => (1700000000000L + i, s"s$i"))
      .toDF("__time", "b").coalesce(1)
      .write.format("druid").mode("append").save(dir)
    val dirs = DruidTableUtil.discoverSegments(dir)
    val cached = SegmentCatalog.loadSchema(dir, dirs)
    assert(cached.isDefined, "manifest should carry the union schema")
    assert(cached.get.fieldNames.toSeq == Seq("__time", "a", "b"))
    // stale manifest (segment list mismatch) falls back, still correct
    assert(SegmentCatalog.loadSchema(dir, dirs.tail).isEmpty)
    assert(DruidTableUtil.unionSchemaOf(dirs).fieldNames.toSeq ==
      Seq("__time", "a", "b"))
  }

  test("conflicting column types fail the append and leave the table intact") {
    import spark.implicits._
    val dir = freshDir()
    (0 until 50).map(i => (1700000000000L + i, i.toLong))
      .toDF("__time", "a").coalesce(1)
      .write.format("druid").mode("overwrite").save(dir)
    val bad = intercept[Exception] {
      (0 until 50).map(i => (1700000000000L + i, s"s$i"))
        .toDF("__time", "a").coalesce(1)
        .write.format("druid").mode("append").save(dir)
    }
    def rootCause(t: Throwable): Throwable =
      if (t.getCause == null || t.getCause == t) t else rootCause(t.getCause)
    assert(rootCause(bad).getMessage.contains("conflicting types"))
    // destination untouched: still one segment, 50 rows, LONG column
    val df = spark.read.format("druid").load(dir)
    assert(df.count() == 50)
    assert(df.schema("a").dataType == org.apache.spark.sql.types.LongType)
  }

  test("missing-column filters and zone pruning stay correct") {
    import spark.implicits._
    val dir = freshDir()
    (0 until 100).map(i => (1700000000000L + i, i.toLong))
      .toDF("__time", "a").coalesce(1)
      .write.format("druid").mode("overwrite").save(dir)
    (0 until 100).map(i => (1700000000000L + i, i.toLong, (i + 1000).toLong))
      .toDF("__time", "a", "b").coalesce(1)
      .write.format("druid").mode("append").save(dir)
    val df = spark.read.format("druid").load(dir)
    // zone filter on b: old segment has NO zone for b -> never pruned;
    // its rows are all null there, dropped by the residual filter
    assert(df.filter(col("b") >= 1050).count() == 50)
    assert(df.filter(col("b").isNull).count() == 100)
  }
}
