package graft.format

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SegmentValidatorSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  private def freshTable(): String = {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-val").toString + "/t"
    (0 until 2000).map(i => (1700000000000L + i,
        if (i % 13 == 0) null else s"u${i % 7}",
        if (i % 11 == 0) null else java.lang.Long.valueOf(i), i * 0.5))
      .toDF("__time", "who", "v", "x")
      .repartition(2).write.format("druid").mode("overwrite").save(out)
    out
  }

  test("writer output validates clean (all column kinds)") {
    val dir = freshTable()
    val results = SegmentValidator.validateTable(dir)
    assert(results.nonEmpty)
    for ((seg, issues) <- results)
      assert(issues.isEmpty, s"$seg: ${issues.mkString("; ")}")
  }

  test("front-coded string columns validate clean and corruption is caught") {
    // first contact with a production segment runs `druid-tool validate`;
    // that has to cover front-coded dictionaries (v3/v5) the same as
    // plain GenericIndexed ones
    import spark.implicits._
    val out = Files.createTempDirectory("graft-val-fc").toString + "/t"
    (0 until 2000).map(i => (1700000000000L + i,
        s"prefix_shared_${i % 23}", s"tag${i % 5}"))
      .toDF("__time", "who", "tag")
      .repartition(2).write.format("druid").mode("overwrite")
      .option("stringEncoding", "frontCoded").save(out)
    val results = SegmentValidator.validateTable(out)
    assert(results.nonEmpty)
    for ((seg, issues) <- results)
      assert(issues.isEmpty, s"$seg: ${issues.mkString("; ")}")
    // corrupt one segment's data blob: validate must flag it
    val seg = graft.sources.druid.DruidTableUtil.discoverSegments(out).head
    val smoosh = Paths.get(seg, "00000.smoosh")
    val ch = java.nio.channels.FileChannel.open(smoosh, StandardOpenOption.WRITE)
    try ch.write(java.nio.ByteBuffer.wrap(Array.fill[Byte](48)(0x33)),
      Files.size(smoosh) / 3)
    finally ch.close()
    assert(SegmentValidator.validate(seg).nonEmpty,
      "corrupted front-coded segment validated clean")
  }

  test("corruption is detected") {
    val dir = freshTable()
    val seg = graft.sources.druid.DruidTableUtil.discoverSegments(dir).head
    val smoosh = Paths.get(seg, "00000.smoosh")
    // flip a run of bytes in the middle of the data file
    val size = Files.size(smoosh)
    val ch = java.nio.channels.FileChannel.open(smoosh, StandardOpenOption.WRITE)
    try {
      val garbage = java.nio.ByteBuffer.wrap(Array.fill[Byte](64)(0x5A))
      ch.write(garbage, size / 2)
    } finally ch.close()
    val issues = SegmentValidator.validate(seg)
    assert(issues.nonEmpty, "corrupted segment validated clean")
  }

  test("a false timeSorted claim is detected") {
    val dir = freshTable()
    val segs = graft.sources.druid.DruidTableUtil.discoverSegments(dir)
    // table IS sorted -> claims verify clean
    assert(SegmentValidator.validateTable(dir).forall(_._2.isEmpty))
    // an unsorted segment with a forged sorted flag must be flagged:
    // descending rows written through the raw writer (which does not
    // sort), then a manifest claiming timeSorted
    val forged = java.nio.file.Paths.get(segs.head).getParent
      .resolve("segment-forged")
    graft.write.SegmentWriter.write(forged,
      Array(5000L, 4000L, 3000L), Nil)
    val metas = graft.sources.druid.SegmentCatalog
      .load(dir, segs).get :+ graft.sources.druid.SegMeta(
        forged.toString, 3000L, 5001L, 3, exactInterval = true,
        timeSorted = true)
    graft.sources.druid.SegmentCatalog.write(dir, metas.sortBy(_.dir))
    val bad = SegmentValidator.validateTable(dir).filter(_._2.nonEmpty)
    assert(bad.exists(_._2.exists(_.contains("claims timeSorted"))),
      s"forged sorted flag not reported: $bad")
  }

  test("manifest row-count drift is detected") {
    val dir = freshTable()
    val segs = graft.sources.druid.DruidTableUtil.discoverSegments(dir)
    val metas = graft.sources.druid.SegmentCatalog.load(dir, segs).get
    val drifted = metas.head.copy(rows = metas.head.rows + 5) +: metas.tail
    graft.sources.druid.SegmentCatalog.write(dir, drifted)
    val bad = SegmentValidator.validateTable(dir).filter(_._2.nonEmpty)
    assert(bad.exists(_._2.exists(_.contains("manifest rows"))),
      s"drift not reported: $bad")
  }
}
