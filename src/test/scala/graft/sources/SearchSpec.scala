package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.druid.DruidSearch

class SearchSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  private def writeTable(bitmaps: Boolean): String = {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-search").toString + "/t"
    (0 until 300)
      .map { i =>
        val kind = Seq("alpha", "beta", "gamma", null)(i % 4)
        (1700000000000L + i, kind, s"tag${i % 10}", i.toLong)
      }
      .toDF("__time", "kind", "tag", "n")
      .repartition(3) // multi-segment: counts must merge across segments
      .write.format("druid").option("bitmapIndexes", bitmaps.toString)
      .mode("overwrite").save(out)
    out
  }

  test("substring search over dictionaries with bitmap counts") {
    val dir = writeTable(bitmaps = true)
    val rows = DruidSearch.search(spark, dir, Seq("kind", "tag"), "a")
      .orderBy("dim", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // 300 rows, i%4 cycle: alpha 75, beta 75, gamma 75 (null skipped)
    val kinds = rows.filter(_._1 == "kind")
    assert(kinds.toSeq == Seq(("kind", "alpha", 75L), ("kind", "beta", 75L),
      ("kind", "gamma", 75L)))
    // every tagN contains "a"; each appears 30 times
    val tags = rows.filter(_._1 == "tag")
    assert(tags.length == 10 && tags.forall(_._3 == 30L))
  }

  test("prefix mode = dictionary-range results, same counts as scan") {
    val dir = writeTable(bitmaps = true)
    val pfx = DruidSearch.search(spark, dir, Seq("kind", "tag"), "g",
        prefix = true)
      .orderBy("dim", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // prefix "g": only gamma (contains-search would also hit tag strings
    // with embedded g — none here — and "gamma" via contains too)
    assert(pfx.toSeq == Seq(("kind", "gamma", 75L)))
    // prefix matching is a strict subset of contains matching
    val containsTag = DruidSearch.search(spark, dir, Seq("tag"), "ag")
      .collect().map(_.getString(1)).toSet
    val prefixTag = DruidSearch.search(spark, dir, Seq("tag"), "ag",
        prefix = true).collect()
    assert(containsTag.size == 10 && prefixTag.isEmpty)
    // case-insensitive prefix falls back to the scan path, same answer
    val ci = DruidSearch.search(spark, dir, Seq("kind"), "GAM",
        caseSensitive = false, prefix = true)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(ci.toSeq == Seq(("gamma", 75L)))
  }

  test("ids-only fallback matches bitmap counts when bitmaps are absent") {
    val withB = DruidSearch.search(spark, writeTable(bitmaps = true),
      Seq("kind", "tag"), "am").orderBy("dim", "value").collect().toSeq
    val without = DruidSearch.search(spark, writeTable(bitmaps = false),
      Seq("kind", "tag"), "am").orderBy("dim", "value").collect().toSeq
    assert(withB.map(_.toSeq) == without.map(_.toSeq))
    assert(withB.nonEmpty) // "am" hits gamma
  }

  test("multi-value dims count rows containing the value, once per row") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-msearch").toString + "/t"
    (0 until 90)
      .map(i => (1700000000000L + i,
        // row i: tags cycle; every 3rd row repeats its first tag
        if (i % 3 == 0) Seq(s"t${i % 5}", s"t${i % 5}", "common")
        else Seq(s"t${i % 5}", "common")))
      .toDF("__time", "tags")
      .repartition(2).write.format("druid").mode("overwrite").save(out)
    val rows = DruidSearch.search(spark, out, Seq("tags"), "common").collect()
    assert(rows.length == 1 && rows.head.getLong(2) == 90L,
      "every row contains 'common' exactly once in the counts")
    val t0 = DruidSearch.search(spark, out, Seq("tags"), "t0").collect()
    // t0 appears in rows with i%5==0 (18 rows), repeats never double-count
    assert(t0.head.getLong(2) == 18L)
  }

  test("case-insensitive mode and unknown/non-string columns") {
    val dir = writeTable(bitmaps = true)
    val cs = DruidSearch.search(spark, dir, Seq("kind"), "ALPHA")
    assert(cs.count() == 0)
    val ci = DruidSearch.search(spark, dir, Seq("kind"), "ALPHA",
      caseSensitive = false)
    assert(ci.collect().map(r => (r.getString(1), r.getLong(2))).toSeq ==
      Seq(("alpha", 75L)))
    // numeric and missing columns are ignored, not an error
    val none = DruidSearch.search(spark, dir, Seq("n", "nope"), "a")
    assert(none.count() == 0)
  }
}
