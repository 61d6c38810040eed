package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partial GROUP BY pushdown: groupBy(<string dim>).count() reads each
  * segment's dictionary + bitmap cardinalities (O(dictionary) partial
  * rows, zero row decode) and Spark's final aggregate merges the
  * per-segment partials — the Druid groupBy/topN execution shape.
  */
class GroupByPushdownSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  private def write(dir: String, bitmaps: Boolean): Unit = {
    import spark.implicits._
    (0 until 3000).map(i => (1700000000000L + i, s"k${i % 7}",
      if (i % 11 == 0) null else s"v${i % 3}"))
      .toDF("__time", "dim", "nullable_dim")
      .repartition(3).write.format("druid")
      .option("bitmapIndexes", bitmaps.toString)
      .mode("overwrite").save(dir)
  }

  test("groupBy(dim).count() is answered from dictionaries across segments") {
    val dir = Files.createTempDirectory("graft-gb").toString + "/t"
    write(dir, bitmaps = true)
    val df = spark.read.format("druid").load(dir).groupBy("dim").count()
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // 3000 rows, i%7 cycle: k0..k1 get 429, the rest 428
    assert(rows.size == 7 && rows.values.sum == 3000)
    assert(rows("k0") == 429 && rows("k6") == 428)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("groupByDim=Some(dim)"),
      s"group-by not pushed to the scan:\n$plan")
    // the scan emits partial rows; Spark still aggregates them
    assert(plan.contains("HashAggregate"), "final merge aggregate missing")
  }

  test("null groups and bitmap-less segments stay exact") {
    val dir = Files.createTempDirectory("graft-gbn").toString + "/t"
    write(dir, bitmaps = false)
    val df = spark.read.format("druid").load(dir)
      .groupBy("nullable_dim").count()
    val rows = df.collect().map(r => (Option(r.getString(0)), r.getLong(1))).toMap
    assert(rows(None) == 273) // i % 11 == 0 in [0, 3000)
    assert(rows.values.sum == 3000)
    assert(df.queryExecution.executedPlan.toString
      .contains("groupByDim=Some(nullable_dim)"))
  }

  test("filters keep group-by un-pushed and correct") {
    val dir = Files.createTempDirectory("graft-gbf").toString + "/t"
    write(dir, bitmaps = true)
    val df = spark.read.format("druid").load(dir)
      .filter(col("dim") =!= "k0").groupBy("dim").count()
    assert(df.count() == 6)
    assert(!df.queryExecution.executedPlan.toString.contains("groupByDim=Some"),
      "group-by must not push through a filter")
  }

  test("schema-evolved segments contribute an all-null group") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-gbe").toString + "/t"
    (0 until 100).map(i => (1700000000000L + i, i.toLong))
      .toDF("__time", "n").coalesce(1)
      .write.format("druid").mode("overwrite").save(dir)
    (100 until 160).map(i => (1700000000000L + i, i.toLong, s"g${i % 2}"))
      .toDF("__time", "n", "dim").coalesce(1)
      .write.format("druid").mode("append").save(dir)
    val rows = spark.read.format("druid").load(dir)
      .groupBy("dim").count()
      .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toMap
    assert(rows == Map(None -> 100L, Some("g0") -> 30L, Some("g1") -> 30L))
  }
}
