package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.druid.{DruidTableUtil, SegmentCatalog}

/** Druid's layout discipline: rows are __time-ascending inside every
  * segment (the writer sorts arrival order), the manifest records it,
  * and the scan reports per-partition ordering so Spark removes
  * redundant time sorts.
  */
class TimeSortedSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  /** One partition of DESCENDING timestamps — worst-case arrival. */
  private lazy val dir: String = {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-tsort").toString + "/t"
    (0 until 5000).map(i => (1700000000000L + (4999 - i) * 1000L, i.toLong))
      .toDF("__time", "n").coalesce(1)
      .write.format("druid").mode("overwrite").save(out)
    out
  }

  test("writer sorts rows by __time inside each segment") {
    val metas = SegmentCatalog
      .load(dir, DruidTableUtil.discoverSegments(dir)).get
    assert(metas.nonEmpty && metas.forall(_.timeSorted),
      s"manifest missing timeSorted: $metas")
    val times = spark.read.format("druid").load(dir)
      .select("__time").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .mapPartitions { it =>
        val a = it.toArray
        Iterator.single(a.zip(a.drop(1)).forall { case (x, y) => x <= y })
      }(org.apache.spark.sql.Encoders.scalaBoolean)
      .collect()
    assert(times.forall(identity), "a partition is not time-ascending")
  }

  test("granularity-bucketed segments stay sorted per bucket") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-tsort-g").toString + "/t"
    (0 until 3000).map(i => (1700000000000L + ((i * 37) % 3000) * 60000L, i.toLong))
      .toDF("__time", "n").coalesce(1)
      .write.format("druid").option("segmentGranularity", "day")
      .mode("overwrite").save(out)
    val metas = SegmentCatalog
      .load(out, DruidTableUtil.discoverSegments(out)).get
    assert(metas.size > 1 && metas.forall(_.timeSorted))
    val ok = spark.read.format("druid").load(out)
      .select("__time").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .mapPartitions { it =>
        val a = it.toArray
        Iterator.single(a.zip(a.drop(1)).forall { case (x, y) => x <= y })
      }(org.apache.spark.sql.Encoders.scalaBoolean)
      .collect()
    assert(ok.forall(identity))
  }

  test("explicit per-partition time sort is removed from the plan") {
    val df = spark.read.format("druid").load(dir)
      .sortWithinPartitions("__time")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Sort ["),
      s"redundant per-partition time sort not removed:\n$p")
    // a GLOBAL order must still sort (per-partition order is all we claim)
    val g = spark.read.format("druid").load(dir).orderBy("__time", "n")
    g.collect()
    val gp = g.queryExecution.executedPlan.toString
    assert(gp.contains("Sort ["), s"global sort wrongly removed:\n$gp")
  }
}
