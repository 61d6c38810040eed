package graft.format

import org.scalatest.funsuite.AnyFunSuite

/** Interop against the only real-Druid-written artifacts available
  * offline: `meta.smoosh` + `version.bin` of the reference's Wikipedia
  * quickstart segment (/root/reference/tests/fixtures/wikipedia-segment;
  * exercised by its wikipedia_segment_test.rs:11-24). The 5.5 MB data
  * blob is absent upstream, so this validates the metadata layer —
  * everything our own writer does NOT produce — against genuine Druid
  * output: header shape, all 22 logical-file entries, chunk offsets,
  * and the big-endian version word.
  */
class WikipediaFixtureSpec extends AnyFunSuite {
  private val fixture = "/root/reference/tests/fixtures/wikipedia-segment"
  private def available = java.nio.file.Files.isReadable(
    java.nio.file.Paths.get(fixture, "meta.smoosh"))

  test("real Druid meta.smoosh parses: header, 22 entries, offsets") {
    assume(available, "wikipedia fixture not present")
    val r = SmooshReader.open(fixture)
    assert(r.numChunks == 1)
    assert(r.maxChunkSize == Int.MaxValue.toLong)
    assert(r.entries.size == 22, s"expected 22 logical files, got ${r.entries.size}")

    // the columns + index/metadata files the reference test asserts
    for (n <- Seq("__time", "channel", "index.drd", "metadata.drd"))
      assert(r.has(n), s"missing logical file '$n'")

    // spot-check offsets straight out of the real file
    assert(r.entry("__time").get == SmooshEntry("__time", 0, 0, 193299))
    assert(r.entry("index.drd").get == SmooshEntry("index.drd", 0, 5472184, 5473182))
    assert(r.entry("metadata.drd").get == SmooshEntry("metadata.drd", 0, 5473182, 5474269))

    // entries tile chunk 0 without gaps: sorted by start, each begins
    // where the previous ended, ending at the known archive size
    val byStart = r.entries.values.toSeq.sortBy(_.start)
    byStart.sliding(2).foreach {
      case Seq(a, b) => assert(a.end == b.start, s"gap between ${a.name} and ${b.name}")
      case _ => ()
    }
    assert(byStart.head.start == 0)
    assert(byStart.last.end == 5474269)

    // data blob is absent upstream: metadata access must not map chunks,
    // and slicing must fail only on the missing file, not at open()
    val ex = intercept[Exception](r.slice("__time"))
    assert(ex.getMessage != null)
  }

  test("real Druid version.bin reads as v9") {
    assume(available, "wikipedia fixture not present")
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fixture, "version.bin"))
    assert(Version.read(bytes) == Version.V9)
  }
}
