package graft.cli

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Drives the CLI subcommands end-to-end over a written segment and
  * asserts stdout (reference src/main.rs:22-67 is covered there by its
  * own integration test; this is the Spark-side equivalent).
  */
class DruidToolSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-cli").toString + "/t"
    (0 until 100).map(i =>
      (new java.sql.Timestamp(1700000000000L + i * 1000L), s"k${i % 5}", i.toLong))
      .toDF("__time", "dim", "n").coalesce(1)
      .write.format("druid").mode("overwrite").save(d)
    // single segment dir for info/files (they operate on one segment)
    val seg = java.nio.file.Files.list(java.nio.file.Paths.get(d))
      .filter(p => graft.format.DruidSegment.isSegmentDir(p))
      .findFirst().get()
    seg.toString
  }

  private def stdoutOf(f: => Unit): String = {
    val bos = new ByteArrayOutputStream()
    Console.withOut(bos)(f)
    new String(bos.toByteArray, "UTF-8")
  }

  test("info prints interval, rows, schema, and metadata.drd fields") {
    val out = stdoutOf(DruidTool.main(Array("info", dir)))
    assert(out.contains("Rows: 100"))
    assert(out.contains("__time") && out.contains("dim") && out.contains("n"))
    assert(out.contains("STRING") && out.contains("LONG"))
    assert(out.contains("Interval: 2023-11-14T22:13:20Z"))
    assert(out.contains("Rollup: false"))
    assert(out.contains("QueryGranularity: none"))
    assert(out.contains("Dimensions: dim"))
  }

  test("files lists every smoosh logical entry with offsets") {
    val out = stdoutOf(DruidTool.main(Array("files", dir)))
    for (n <- Seq("__time", "dim", "n", "index.drd", "metadata.drd"))
      assert(out.contains(n), s"missing $n in files output")
    // entries tile contiguously: every line's end is some line's start
    val rows = out.linesIterator.drop(1).map(_.trim.split("\\s+")).filter(_.length == 5).toSeq
    assert(rows.size == 5)
  }

  test("dump --format csv respects --columns and --limit") {
    spark // force session so the CLI reuses it instead of creating one
    val out = stdoutOf(DruidTool.main(Array("dump", dir,
      "--columns", "dim,n", "--limit", "3", "--format", "csv")))
    val lines = out.trim.linesIterator.toSeq
    assert(lines.head == "dim,n")
    assert(lines.tail.length == 3)
    assert(lines.tail.forall(_.matches("k\\d,\\d+")))
  }

  test("query runs SQL against the `segment` view") {
    spark
    val out = stdoutOf(DruidTool.main(Array("query", dir,
      "SELECT dim, count(*) AS c FROM segment GROUP BY dim ORDER BY dim")))
    assert(out.contains("k0") && out.contains("k4"))
    assert(out.contains("20")) // 100 rows over 5 dims
  }

  test("info on a table directory prints the manifest summary") {
    val table = java.nio.file.Paths.get(dir).getParent.toString
    val out = stdoutOf(DruidTool.main(Array("info", table)))
    assert(out.contains("Segments: 1"))
    assert(out.contains("Rows: 100"))
    assert(out.contains("dim") && out.contains("n"))
    assert(out.contains("Zoned columns: n"))
    assert(out.contains("TimeSorted: true"))
    assert(out.contains("DayAligned: "))
  }

  test("search prints matching dimension values with counts") {
    spark
    // parent table dir (search is a table-level operation)
    val table = java.nio.file.Paths.get(dir).getParent.toString
    val out = stdoutOf(DruidTool.main(Array("search", table, "k3")))
    assert(out.contains("k3") && out.contains("20"))
    assert(!out.contains("k1"))
    val none = stdoutOf(DruidTool.main(Array("search", table, "K3")))
    assert(!none.contains("k3"))
    val ci = stdoutOf(DruidTool.main(Array("search", table, "K3",
      "--ignore-case")))
    assert(ci.contains("k3") && ci.contains("20"))
  }

  test("CLI session reuse does not stop the caller's SparkSession") {
    spark
    stdoutOf(DruidTool.main(Array("dump", dir, "--limit", "1", "--format", "csv")))
    assert(!spark.sparkContext.isStopped)
    assert(spark.range(3).count() == 3)
  }
}
