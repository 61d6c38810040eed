package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.sources.druid.SegmentCatalog

/** The table manifest: planning without opening segments, with safe
  * fallback when the manifest is missing or stale.
  */
class SegmentCatalogSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import scala.jdk.CollectionConverters._

  private def write(out: String, n: Int, parts: Int = 2): Unit = {
    import spark.implicits._
    (0 until n).map(i => (new java.sql.Timestamp(1700000000000L + i * 1000L), i.toLong))
      .toDF("__time", "n").repartition(parts)
      .write.format("druid").mode("overwrite").save(out)
  }

  test("commit writes a manifest covering exactly the committed segments") {
    val out = Files.createTempDirectory("graft-cat").toString + "/t"
    write(out, 1000)
    val manifest = Paths.get(out, SegmentCatalog.FileName)
    assert(Files.isRegularFile(manifest))
    val metas = SegmentCatalog.metaFor(out)
    assert(metas.size == 2)
    assert(metas.map(_.rows).sum == 1000)
    assert(metas.forall(_.exactInterval))
  }

  test("queries plan from the manifest with ZERO planner segment opens") {
    val out = Files.createTempDirectory("graft-cat0").toString + "/t"
    write(out, 2000)
    def opens(): Long = graft.format.DruidSegment.openCounts.asScala
      .collect { case (d, c) if d.startsWith(out) => c.toLong }.sum
    // sum of an EXPRESSION is not metadata-answerable: data must scan
    val df = spark.read.format("druid").load(out)
      .agg(sum(col("n") * 2).as("s"))
    val before = opens()
    assert(df.head.getLong(0) == (0 until 2000).map(_.toLong * 2).sum)
    val delta = opens() - before
    // only the 2 reader tasks open segments; planning reads the manifest
    assert(delta == 2, s"expected 2 reader-only opens, got $delta")
    // plain SUM(col) is answered entirely from the manifest: ZERO opens
    val before2 = opens()
    assert(spark.read.format("druid").load(out).groupBy().sum("n")
      .head.getLong(0) == (0 until 2000).map(_.toLong).sum)
    assert(opens() - before2 == 0,
      "metadata-answered sum must not open any segment")
  }

  test("append keeps the manifest complete across jobs") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-cata").toString + "/t"
    write(out, 500, parts = 1)
    (0 until 300).map(i => (new java.sql.Timestamp(1800000000000L + i * 1000L), i.toLong))
      .toDF("__time", "n").coalesce(1)
      .write.format("druid").mode("append").save(out)
    val metas = SegmentCatalog.metaFor(out)
    assert(metas.size == 2 && metas.map(_.rows).sum == 800)
    assert(spark.read.format("druid").load(out).count() == 800)
  }

  test("stale manifest (hand-copied segment) falls back to opening metadata") {
    val out = Files.createTempDirectory("graft-cats").toString + "/t"
    write(out, 400, parts = 1)
    // hand-copy a segment dir the manifest does not know about
    val seg = Files.list(Paths.get(out)).iterator().asScala
      .filter(p => graft.format.DruidSegment.isSegmentDir(p)).next()
    val copy = Paths.get(out, "segment-manual")
    Files.walk(seg).iterator().asScala.toSeq.foreach { p =>
      Files.copy(p, copy.resolve(seg.relativize(p).toString))
    }
    assert(SegmentCatalog.load(out,
      graft.sources.druid.DruidTableUtil.discoverSegments(out)).isEmpty)
    // reads stay correct via the fallback path
    assert(spark.read.format("druid").load(out).count() == 800)
  }

  test("corrupt manifest is ignored, not fatal") {
    val out = Files.createTempDirectory("graft-catc").toString + "/t"
    write(out, 100, parts = 1)
    Files.write(Paths.get(out, SegmentCatalog.FileName),
      "not json at all".getBytes("UTF-8"))
    assert(spark.read.format("druid").load(out).count() == 100)
  }
}
