package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ORDER BY __time LIMIT k pushdown: the scan reads only the
  * interval-extreme segments that provably contain the true top-k —
  * the "most recent events" query on a day-bucketed 100 TB table
  * touches one day, not the table.
  */
class TopNPushdownSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  // 10 day-bucketed segments, 100 rows each
  private lazy val dir: String = {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-topn").toString + "/t"
    (0 until 1000).map { i =>
      (new java.sql.Timestamp(1700000000000L + (i / 100) * 86400000L + (i % 100) * 1000L), i.toLong)
    }.toDF("__time", "n").coalesce(1)
      .write.format("druid").option("segmentGranularity", "day")
      .mode("overwrite").save(out)
    assert(graft.sources.druid.DruidTableUtil.discoverSegments(out).size == 10)
    out
  }

  /** Segment count the scan plans for ORDER BY __time LIMIT k. */
  private def plannedSegments(desc: Boolean, k: Int): Int = {
    import org.apache.spark.sql.connector.expressions.{Expressions, NullOrdering, SortDirection}
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val builder = new graft.sources.druid.DruidScanBuilder(
      dir, graft.sources.druid.DruidTableUtil.schemaFor(dir),
      new CaseInsensitiveStringMap(java.util.Map.of()))
    val dirn = if (desc) SortDirection.DESCENDING else SortDirection.ASCENDING
    assert(builder.pushTopN(Array(
      Expressions.sort(Expressions.column("__time"), dirn)), k))
    builder.build().toBatch.planInputPartitions()
      .map(_.asInstanceOf[graft.sources.druid.DruidInputPartition].dir)
      .distinct.length
  }

  test("latest-k reads only the newest segments, exactly") {
    val df = spark.read.format("druid").load(dir)
      .orderBy(col("__time").desc).limit(5)
    val rows = df.collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(999L, 998L, 997L, 996L, 995L))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("topNTime=Some((true,5))"),
      s"topN not pushed:\n$plan")
    assert(plannedSegments(desc = true, 5) == 1)
  }

  test("earliest-k reads only the oldest segments; k spanning segments widens the cut") {
    val asc = spark.read.format("druid").load(dir)
      .orderBy(col("__time").asc).limit(3)
    assert(asc.collect().map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L))
    assert(plannedSegments(desc = false, 3) == 1)
    // k = 250 needs 3 segments (100 rows each)
    assert(plannedSegments(desc = true, 250) == 3)
    val wide = spark.read.format("druid").load(dir)
      .orderBy(col("__time").desc).limit(250)
    assert(wide.collect().map(_.getLong(1)).min == 750L)
  }

  test("filters disable the cut (residual rows could starve the top-k)") {
    val df = spark.read.format("druid").load(dir)
      .filter(col("n") % 2 === 0)
      .orderBy(col("__time").desc).limit(5)
    assert(df.collect().map(_.getLong(1)).toSeq ==
      Seq(998L, 996L, 994L, 992L, 990L))
    assert(!df.queryExecution.executedPlan.toString.contains("topNTime=Some"),
      "topN must not push through a filter")
  }

  test("k larger than the table scans everything and stays exact") {
    val df = spark.read.format("druid").load(dir)
      .orderBy(col("__time").asc).limit(5000)
    assert(df.count() == 1000)
    assert(plannedSegments(desc = false, 5000) == 10)
  }
}
