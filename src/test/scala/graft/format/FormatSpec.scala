package graft.format

import java.nio.ByteBuffer
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.write.SegmentWriter
import graft.write.SegmentWriter._

/** Byte-level tests mirroring the reference's inline suites
  * (reference src/segment/version.rs:27-49,
  * src/column/generic_indexed.rs:258-345, src/column/vsize_ints.rs:113-163)
  * plus round-trip coverage the reference lacks (FIXTURES.md §2).
  */
class VersionSpec extends AnyFunSuite {
  test("valid v9") { assert(Version.read(Array(0, 0, 0, 9)) == 9) }
  test("invalid version") {
    assertThrows[DruidFormatException](Version.read(Array(0, 0, 0, 8)))
  }
  test("truncated") {
    assertThrows[DruidFormatException](Version.read(Array(0, 0)))
  }
}

class GenericIndexedSpec extends AnyFunSuite {
  private def gi(elems: Seq[Array[Byte]]) =
    GenericIndexed.wrap(GenericIndexed.writeLengthPrefixed(elems, sorted = true))

  test("read strings") {
    val g = gi(Seq("alpha", "beta", "gamma").map(_.getBytes))
    assert(g.numElements == 3)
    assert(g.stringAt(0) == "alpha")
    assert(g.stringAt(1) == "beta")
    assert(g.stringAt(2) == "gamma")
  }

  test("null element mid-list") {
    val g = gi(Seq("hello".getBytes, null, "world".getBytes))
    assert(g.stringAt(0) == "hello")
    assert(g.bytesAt(1) == null)
    assert(g.stringAt(2) == "world")
  }

  test("empty element") {
    val g = gi(Seq(Array.emptyByteArray, "x".getBytes))
    assert(g.bytesAt(0).length == 0)
    assert(g.stringAt(1) == "x")
  }

  test("empty container") {
    val g = gi(Nil)
    assert(g.numElements == 0)
    assert(g.totalSize == GenericIndexed.HEADER)
  }

  test("invalid version") {
    val bad = Array[Byte](0x02, 0x00, 0, 0, 0, 0, 0, 0, 0, 0)
    assertThrows[DruidFormatException](GenericIndexed.wrap(bad).flags)
  }

  test("ObjectStrategy strings + auto detection") {
    val names = Seq("channel", "cityName", "added", null)
    val g = GenericIndexed.wrap(GenericIndexed.writeObjectStrings(names, sorted = false))
    assert(g.objectStringAt(0) == "channel")
    assert((0 until 4).map(g.stringAuto) == Seq("channel", "cityName", "added", null))
    // auto also reads length-prefixed elements
    val lp = gi(Seq("alpha".getBytes, null))
    assert(lp.stringAuto(0) == "alpha")
    assert(lp.stringAuto(1) == null)
  }

  test("total_size chaining two structures") {
    val a = GenericIndexed.writeObjectStrings(Seq("a", "bb"), sorted = false)
    val b = GenericIndexed.writeLengthPrefixed(Seq("ccc".getBytes), sorted = true)
    val buf = ByteBuffer.wrap(a ++ b)
    val g1 = new GenericIndexed(buf, 0)
    assert(g1.totalSize == a.length)
    val g2 = new GenericIndexed(buf, g1.totalSize)
    assert(g2.stringAt(0) == "ccc")
  }
}

class VSizeIntsSpec extends AnyFunSuite {
  test("single byte") {
    val c = VSizeInts.wrap(VSizeInts.write(Seq(0, 1, 2, 255), 1))
    assert(c.length == 4)
    assert(Seq(0, 1, 2, 255).indices.map(c.get) == Seq(0, 1, 2, 255))
  }
  test("two bytes") {
    val c = VSizeInts.wrap(VSizeInts.write(Seq(0, 256, 1000, 65535), 2))
    assert((0 until 4).map(c.get) == Seq(0, 256, 1000, 65535))
  }
  test("three bytes") {
    val vals = Seq(0, 1 << 20, (1 << 24) - 1)
    val c = VSizeInts.wrap(VSizeInts.write(vals, 3))
    assert(vals.indices.map(c.get) == vals)
  }
  test("bytesNeeded") {
    assert(VSizeInts.bytesNeeded(255) == 1)
    assert(VSizeInts.bytesNeeded(256) == 2)
    assert(VSizeInts.bytesNeeded(1 << 16) == 3)
    assert(VSizeInts.bytesNeeded(1 << 24) == 4)
  }
}

class CompressedColumnarSpec extends AnyFunSuite {
  test("longs round-trip with short last block") {
    val vals = Array.tabulate(1000)(i => i.toLong * 1234567 - 42)
    val bytes = CompressedColumnar.writeLongs(vals, Compression.LZ4, sizePer = 64)
    val r = new CompressedLongs(ByteBuffer.wrap(bytes), 0)
    assert(r.length == 1000)
    assert(r.blockCount == 16) // 15 full + 1 short (1000 = 15*64 + 40)
    assert(vals.indices.forall(i => r.get(i) == vals(i)))
  }

  test("random access across blocks") {
    val vals = Array.tabulate(300)(i => (i * 7919).toLong)
    val r = new CompressedLongs(
      ByteBuffer.wrap(CompressedColumnar.writeLongs(vals, sizePer = 50)), 0)
    // jump around block boundaries
    for (i <- Seq(299, 0, 150, 49, 50, 250, 1))
      assert(r.get(i) == vals(i))
  }

  test("doubles/floats round-trip") {
    val dv = Array.tabulate(500)(i => i * 0.333 - 17.5)
    val dr = new CompressedDoubles(
      ByteBuffer.wrap(CompressedColumnar.writeDoubles(dv, sizePer = 100)), 0)
    assert(dv.indices.forall(i => dr.get(i) == dv(i)))
    val fv = Array.tabulate(500)(i => (i * 0.25f) - 3f)
    val fr = new CompressedFloats(
      ByteBuffer.wrap(CompressedColumnar.writeFloats(fv, sizePer = 100)), 0)
    assert(fv.indices.forall(i => fr.get(i) == fv(i)))
  }

  test("ints round-trip at 1/2/3-byte widths") {
    for (max <- Seq(200, 60000, 1 << 20)) {
      val vals = Array.tabulate(777)(i => (i * 31) % max)
      val r = new CompressedInts(
        ByteBuffer.wrap(CompressedColumnar.writeInts(vals, sizePerOpt = Some(100))), 0)
      assert(r.length == 777)
      assert(vals.indices.forall(i => r.get(i) == vals(i)))
    }
  }

  test("uncompressed and zstd strategies") {
    val vals = Array.tabulate(200)(_.toLong)
    for (c <- Seq(Compression.UNCOMPRESSED, Compression.ZSTD)) {
      val r = new CompressedLongs(
        ByteBuffer.wrap(CompressedColumnar.writeLongs(vals, c, sizePer = 30)), 0)
      assert(vals.indices.forall(i => r.get(i) == vals(i)), s"compression $c")
    }
  }

  test("lzf strategy round-trips through the block container") {
    val vals = Array.tabulate(5000)(i => (i % 97).toLong) // compressible
    val r = new CompressedLongs(
      ByteBuffer.wrap(CompressedColumnar.writeLongs(vals, Compression.LZF, sizePer = 1024)), 0)
    assert(vals.indices.forall(i => r.get(i) == vals(i)))
  }

  test("lzf codec interops with the ning stream format Druid uses") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(0, 1, 3, 5, 100, 5000, 70000)) {
      val data = new Array[Byte](n)
      // first half compressible runs, second half random bytes
      for (i <- 0 until n)
        data(i) = if (i < n / 2) (i % 13).toByte else rnd.nextInt().toByte
      val ours = Compression.compress(Compression.LZF, data)
      val ningDecoded = com.ning.compress.lzf.LZFDecoder.decode(ours)
      assert(ningDecoded.sameElements(data), s"ning cannot decode our stream (n=$n)")
      val ningEncoded = com.ning.compress.lzf.LZFEncoder.encode(data)
      val dst = new Array[Byte](n)
      Compression.decompress(Compression.LZF,
        ByteBuffer.wrap(ningEncoded), 0, ningEncoded.length, dst, n)
      assert(dst.sameElements(data), s"we cannot decode ning's stream (n=$n)")
    }
  }

  test("lzf decoder handles hand-built back-reference code") {
    // literal 'abc', then a match: len 5, distance 3 -> "abcabcab"
    val raw = Array[Byte](2, 'a', 'b', 'c', ((5 - 2) << 5).toByte, 2)
    val chunk = Array[Byte]('Z', 'V', 1, 0, raw.length.toByte, 0, 8) ++ raw
    val dst = new Array[Byte](8)
    Compression.decompress(Compression.LZF,
      ByteBuffer.wrap(chunk), 0, chunk.length, dst, 8)
    assert(new String(dst) == "abcabcab")
  }

  test("randomized longs round-trip (fixed seed)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 30) {
      val arr = Array.fill(1 + rnd.nextInt(500))(rnd.nextLong())
      val sizePer = 1 + rnd.nextInt(100)
      val r = new CompressedLongs(
        ByteBuffer.wrap(CompressedColumnar.writeLongs(arr, sizePer = sizePer)), 0)
      assert(arr.indices.forall(i => r.get(i) == arr(i)))
    }
  }
}

class StringColumnSpec extends AnyFunSuite {
  test("v2 round-trip with nulls") {
    val vals = Seq("de", "en", null, "fr", "en", "de", null, "zh")
    val col = new StringColumn(ByteBuffer.wrap(StringColumn.write(vals)), 0)
    assert(col.length == 8)
    assert((0 until 8).map(col.stringAt) == vals)
    // null sorts first in the dictionary, Druid-style
    assert(col.dictionary.bytesAt(0) == null)
  }

  test("v0 legacy round-trip") {
    val vals = Seq("alpha", "beta", "alpha", "gamma")
    val col = new StringColumn(ByteBuffer.wrap(StringColumn.writeV0(vals)), 0)
    assert((0 until 4).map(col.stringAt) == vals)
  }

  test("randomized unicode strings round-trip (fixed seed)") {
    val rnd = new scala.util.Random(7)
    // sample whole code points (the emoji is a surrogate pair)
    val alphabet = "abcXYZ012äöü日本語🙂".codePoints().toArray
    for (_ <- 0 until 20) {
      val vals = List.fill(1 + rnd.nextInt(80)) {
        if (rnd.nextInt(10) == 0) null
        else (0 until rnd.nextInt(12)).map(_ =>
          new String(Character.toChars(alphabet(rnd.nextInt(alphabet.length))))).mkString
      }
      val col = new StringColumn(ByteBuffer.wrap(StringColumn.write(vals)), 0)
      assert(vals.indices.map(col.stringAt) == vals)
    }
  }

  test("large dictionary forces 2-byte ids") {
    val vals = (0 until 5000).map(i => s"val_${i % 1000}")
    val col = new StringColumn(ByteBuffer.wrap(StringColumn.write(vals)), 0)
    assert(vals.indices.map(col.stringAt) == vals)
  }
}

class SegmentRoundTripSpec extends AnyFunSuite {
  test("full segment write -> open -> read all column types") {
    val dir = Files.createTempDirectory("graft-seg")
    val n = 2000
    val time = Array.tabulate(n)(i => 1700000000000L + i * 1000L)
    val longs = Array.tabulate(n)(i => i.toLong * 3 - 7)
    val doubles = Array.tabulate(n)(i => i * 0.5)
    val floats = Array.tabulate(n)(i => i * 0.25f)
    val strings = Array.tabulate(n)(i => if (i % 17 == 0) null else s"s${i % 50}")
    SegmentWriter.write(dir, time, Seq(
      "metric_l" -> LongValues(longs),
      "metric_d" -> DoubleValues(doubles),
      "metric_f" -> FloatValues(floats),
      "dim_s" -> StringValues(strings)))

    val seg = DruidSegment.open(dir.toString)
    assert(seg.numRows == n)
    assert(seg.columnNames == Seq("__time", "metric_l", "metric_d", "metric_f", "dim_s"))
    assert(seg.metadata.dimensions == Seq("dim_s"))
    assert(seg.metadata.intervalStartMs == time.head)
    assert(seg.metadata.intervalEndMs == time.last + 1)

    val TimeColumnData(t) = seg.column("__time"): @unchecked
    assert((0 until n).forall(i => t.get(i) == time(i)))
    val LongColumnData(l, _) = seg.column("metric_l"): @unchecked
    assert((0 until n).forall(i => l.get(i) == longs(i)))
    val DoubleColumnData(d, _) = seg.column("metric_d"): @unchecked
    assert((0 until n).forall(i => d.get(i) == doubles(i)))
    val FloatColumnData(f, _) = seg.column("metric_f"): @unchecked
    assert((0 until n).forall(i => f.get(i) == floats(i)))
    val StringColumnData(sc) = seg.column("dim_s"): @unchecked
    assert((0 until n).forall(i => sc.stringAt(i) == strings(i)))
  }

  test("multi-chunk rollover") {
    val dir = Files.createTempDirectory("graft-seg-chunks")
    val n = 5000
    val time = Array.tabulate(n)(_.toLong)
    SegmentWriter.write(dir, time,
      Seq("v" -> LongValues(Array.tabulate(n)(i => (i * 7919L) % 104729))),
      maxChunkSize = 8 * 1024)
    assert(Files.list(dir).toArray.map(_.toString).count(_.endsWith(".smoosh")) > 2)
    val seg = DruidSegment.open(dir.toString)
    assert(seg.numRows == n)
    val LongColumnData(l, _) = seg.column("v"): @unchecked
    assert((0 until n).forall(i => l.get(i) == (i * 7919L) % 104729))
  }

  test("complex column surfaces binary blobs") {
    val dir = Files.createTempDirectory("graft-seg-complex")
    val n = 100
    val blobs = Array.tabulate(n)(i => Array.fill(8)(i.toByte))
    SegmentWriter.write(dir, Array.tabulate(n)(_.toLong),
      Seq("sketch" -> ComplexValues("hyperUnique", blobs)))
    val seg = DruidSegment.open(dir.toString)
    val ComplexColumnData(gi) = seg.column("sketch"): @unchecked
    assert(gi.numElements == n)
    assert(gi.bytesAt(5).toSeq == blobs(5).toSeq)
  }
}

class RobustnessSpec extends AnyFunSuite {
  test("dictIdOf agrees with UTF-8 sort for supplementary chars") {
    // '🙂' (emoji, U+1F642) sorts AFTER '￿' in UTF-8 byte
    // order but BEFORE it in UTF-16 order — the classic divergence
    val vals = Seq("a", "￿", new String(Character.toChars(0x1F642)), "b")
    val bytes = StringColumn.write(vals)
    val col = new StringColumn(ByteBuffer.wrap(bytes), 0, bytes.length)
    vals.foreach { v =>
      val id = col.dictIdOf(v)
      assert(id >= 0 && col.dictionary.stringAt(id) == v, s"lookup failed for $v")
    }
  }

  test("corrupt inputs raise DruidFormatException, not arbitrary errors") {
    assertThrows[DruidFormatException](
      new CompressedLongs(ByteBuffer.wrap(Array[Byte](0x07, 0, 0, 0, 1)), 0))
    assertThrows[DruidFormatException](
      new StringColumn(ByteBuffer.wrap(Array[Byte](0x05, 0, 0)), 0))
    assertThrows[DruidFormatException](
      new VSizeInts(ByteBuffer.wrap(Array[Byte](0, 9, 0, 0, 0, 4)), 0))
  }

  test("empty segment (0 rows) round-trips") {
    val dir = Files.createTempDirectory("graft-empty")
    SegmentWriter.write(dir, Array.emptyLongArray,
      Seq("s" -> StringValues(Array.empty[String]),
          "v" -> LongValues(Array.emptyLongArray)))
    val seg = DruidSegment.open(dir.toString)
    assert(seg.numRows == 0)
    val StringColumnData(sc) = seg.column("s"): @unchecked
    assert(sc.length == 0)
  }
}
