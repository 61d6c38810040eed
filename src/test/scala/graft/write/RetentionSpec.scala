package graft.write

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.druid.{DruidTableUtil, SegmentCatalog}

/** Interval retention: dropping by time is a metadata-only delete of
  * whole segments on a day-bucketed table — no scan, no rewrite.
  */
class RetentionSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  private def dayTable(): String = {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-retain").toString + "/t"
    // 5 UTC days x 200 rows
    (0 until 1000).map(i => (1700006400000L + (i % 5) * 86400000L +
        (i / 5) * 1000L, i.toLong))
      .toDF("__time", "n").coalesce(1)
      .write.format("druid").option("segmentGranularity", "day")
      .mode("overwrite").save(out)
    out
  }

  test("drops exactly the segments before the cutoff; straddlers stay") {
    val dir = dayTable()
    val before = SegmentCatalog.metaFor(dir)
    assert(before.size == 5)
    // segment intervals are TIGHT (actual [min, max+1] of the data, not
    // day-bucket bounds), so the drop is data-exact: a cutoff INSIDE
    // day 3's data range (rows span the first 200s of each day) keeps
    // day 3 as a straddler and drops days 1-2 whole
    val cutoff = 1700006400000L + 2 * 86400000L + 100000L
    val st = Retention.dropOlderThan(dir, cutoff)
    assert(st.segmentsDropped == 2 && st.rowsDropped == 400 &&
      st.segmentsKept == 3, s"unexpected $st")
    val back = spark.read.format("druid").load(dir)
    assert(back.count() == 600)
    // manifest refreshed in place: planning still zero-open and exact
    val metas = SegmentCatalog
      .load(dir, DruidTableUtil.discoverSegments(dir)).get
    assert(metas.size == 3)
    // schema cache survives the manifest rewrite
    assert(SegmentCatalog.loadSchema(dir, metas.map(_.dir)).isDefined)
    // idempotent: nothing else to drop at the same cutoff
    assert(Retention.dropOlderThan(dir, cutoff) ==
      Retention.Stats(0, 0L, 3))
    // the survivors validate clean
    val issues = graft.format.SegmentValidator.validateTable(dir)
      .filter(_._2.nonEmpty)
    assert(issues.isEmpty, issues.mkString("; "))
    // a cutoff past everything drops the rest (the empty table keeps
    // its directory + manifest; the connector requires >= 1 segment to
    // read, same as a never-written path)
    val st2 = Retention.dropOlderThan(dir, Long.MaxValue)
    assert(st2 == Retention.Stats(3, 600L, 0))
    assertThrows[IllegalArgumentException](
      DruidTableUtil.discoverSegments(dir))
  }

  test("SQL DELETE by __time range is metadata-only; misaligned deletes are rejected") {
    val dir = dayTable()
    val root = java.nio.file.Paths.get(dir).getParent.toString
    spark.conf.set("spark.sql.catalog.delcat",
      classOf[graft.sources.druid.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.delcat.root", root)

    // aligned range: days 1-2 delete whole, no data blocks decode
    val before = graft.format.Compression.blocksDecoded.get()
    spark.sql("DELETE FROM delcat.t WHERE __time < " +
      s"timestamp_millis(${1700006400000L + 2 * 86400000L})")
    assert(graft.format.Compression.blocksDecoded.get() == before,
      "DELETE decoded data blocks — not metadata-only")
    assert(SegmentCatalog.metaFor(dir).size == 3)
    assert(spark.read.format("druid").load(dir).count() == 600)

    // a cutoff inside day 3's data range would split a segment: refused,
    // table unchanged
    val err = intercept[Exception] {
      spark.sql("DELETE FROM delcat.t WHERE __time < " +
        s"timestamp_millis(${1700006400000L + 2 * 86400000L + 100000L})")
    }
    assert(err.getMessage.toLowerCase.contains("delete"), err.getMessage)
    assert(SegmentCatalog.metaFor(dir).size == 3)

    // non-time predicate: refused
    intercept[Exception] {
      spark.sql("DELETE FROM delcat.t WHERE n = 3")
    }
    assert(spark.read.format("druid").load(dir).count() == 600)

    // bounded two-sided range aligned on day 4: deletes just that day
    spark.sql("DELETE FROM delcat.t WHERE __time >= " +
      s"timestamp_millis(${1700006400000L + 3 * 86400000L}) AND __time < " +
      s"timestamp_millis(${1700006400000L + 4 * 86400000L})")
    assert(SegmentCatalog.metaFor(dir).size == 2)
    assert(spark.read.format("druid").load(dir).count() == 400)
  }
}
