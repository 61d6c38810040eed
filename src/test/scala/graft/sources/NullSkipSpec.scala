package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IS NOT NULL pushdown: Spark implies IsNotNull for most predicates;
  * the reader serves it from the numeric null-bitmap trailers so null
  * rows of sparse metrics never decode, and a schema-evolved segment
  * that predates the column skips entirely (every row is null there).
  */
class NullSkipSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  test("null rows are excluded from the row selection") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-nn").toString + "/t"
    // 90% nulls in v
    (0 until 1000).map(i => (1700000000000L + i, i.toLong,
      if (i % 10 == 0) Some(i.toDouble) else None))
      .toDF("__time", "n", "v").coalesce(1)
      .write.format("druid").mode("overwrite").save(dir)

    val df = spark.read.format("druid").load(dir).filter(col("v").isNotNull)
    assert(df.count() == 100)
    // the scan description shows the pushed not-null column
    assert(df.queryExecution.executedPlan.toString.contains("notNull=v"),
      "IsNotNull not pushed to the scan")

    // direct row-selection check: only the 100 non-null rows survive
    val seg = graft.format.DruidSegment.open(
      graft.sources.druid.DruidTableUtil.discoverSegments(dir).head)
    val part = graft.sources.druid.DruidInputPartition(
      seg.dir.toString, 0, 1000, -1, 4096, Map.empty, Set("v"))
    val sel = graft.sources.druid.RowSelectionProbe.build(seg, part)
    assert(sel != null && sel.length == 100)

    // predicates on v imply IsNotNull: same skip, correct result
    assert(spark.read.format("druid").load(dir)
      .filter(col("v") >= 500.0).count() == 50)
  }

  test("IS NULL selects exactly the trailer rows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-isn").toString + "/t"
    (0 until 1000).map(i => (1700000000000L + i, i.toLong,
      if (i % 10 == 0) Some(i.toDouble) else None))
      .toDF("__time", "n", "v").coalesce(1)
      .write.format("druid").mode("overwrite").save(dir)
    val df = spark.read.format("druid").load(dir).filter(col("v").isNull)
    assert(df.count() == 900)
    assert(df.queryExecution.executedPlan.toString.contains("isNull=v"),
      "IsNull not pushed to the scan")
    // no-null column: IS NULL matches nothing, split skips entirely
    assert(spark.read.format("druid").load(dir)
      .filter(col("n").isNull).count() == 0)
  }

  test("COUNT(col) answers from manifest null counts with no decode") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-cntc").toString + "/t"
    (0 until 1000).map(i => (1700000000000L + i, i.toLong,
      if (i % 4 == 0) Some(i.toDouble) else None))
      .toDF("__time", "n", "v").repartition(3)
      .write.format("druid").mode("overwrite").save(dir)
    val df = spark.read.format("druid").load(dir)
    val counted = df.agg(count(col("v")), count(col("n")), count(lit(1)))
    assert(counted.head().toSeq == Seq(250L, 1000L, 1000L))
    val plan = counted.queryExecution.executedPlan.toString
    assert(plan.contains("count(v)") && !plan.contains("HashAggregate"),
      s"count(col) not completely pushed:\n$plan")
    // append a segment WITHOUT v: its rows count for n, zero for v
    (0 until 100).map(i => (1700010000000L + i, i.toLong))
      .toDF("__time", "n").coalesce(1)
      .write.format("druid").mode("append").save(dir)
    val again = spark.read.format("druid").load(dir)
      .agg(count(col("v")), count(col("n"))).head()
    assert(again.toSeq == Seq(250L, 1100L))
  }

  test("IS NOT NULL prunes all-null segments at planning") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-nnp").toString + "/t"
    (0 until 100).map(i => (1700000000000L + i, i.toLong))
      .toDF("__time", "a").coalesce(1)
      .write.format("druid").mode("overwrite").save(dir)
    (100 until 200).map(i => (1700000000000L + i, i.toLong, i.toLong))
      .toDF("__time", "a", "b").coalesce(1)
      .write.format("druid").mode("append").save(dir)
    val df = spark.read.format("druid").load(dir).filter(col("b").isNotNull)
    // only the segment that HAS b plans a partition
    assert(df.rdd.getNumPartitions == 1,
      s"all-null segment not pruned: ${df.rdd.getNumPartitions}")
    assert(df.count() == 100)
  }

  test("IS NOT NULL on a column a segment predates skips the whole split") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-nn2").toString + "/t"
    (0 until 100).map(i => (1700000000000L + i, i.toLong))
      .toDF("__time", "a").coalesce(1)
      .write.format("druid").mode("overwrite").save(dir)
    (100 until 200).map(i => (1700000000000L + i, i.toLong, i.toLong))
      .toDF("__time", "a", "b").coalesce(1)
      .write.format("druid").mode("append").save(dir)
    val df = spark.read.format("druid").load(dir).filter(col("b").isNotNull)
    assert(df.count() == 100)
    assert(df.select(min(col("b"))).head().getLong(0) == 100L)
    // columns without a trailer (no nulls at all) stay unaffected
    assert(spark.read.format("druid").load(dir)
      .filter(col("a").isNotNull).count() == 200)
  }
}
