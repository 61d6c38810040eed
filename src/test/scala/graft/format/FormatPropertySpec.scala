package graft.format

import java.nio.ByteBuffer

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based round trips for the binary format core: arbitrary
  * inputs (empty, single, negative, full-range, random unicode) must
  * survive write -> mmap-style read unchanged. Catches the boundary
  * bugs example-based specs miss — block edges, width transitions,
  * offset chaining.
  */
class FormatPropertySpec extends AnyFunSuite {

  /** Run a ScalaCheck property under ScalaTest (no bridge artifact in
    * the offline cache): 100 samples, no shrinking of custom gens.
    */
  private def check(prop: Prop): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(r.passed, r.status.toString)
  }

  private def wrap(bytes: Array[Byte]): ByteBuffer =
    ByteBuffer.wrap(bytes).asReadOnlyBuffer()

  test("VSizeInts round-trips any non-negative ints at every byte width") {
    check(Prop.forAllNoShrink(Gen.choose(1, 4).flatMap { w =>
      val max = if (w == 4) Int.MaxValue else (1 << (8 * w)) - 1
      Gen.listOf(Gen.choose(0, max)).map(vs => (w, vs))
    }) { case (w, vs) =>
      val bytes = VSizeInts.write(vs, w)
      val col = new VSizeInts(wrap(bytes), 0)
      assert(col.length == vs.length)
      vs.zipWithIndex.foreach { case (v, i) => assert(col.get(i) == v) }
      true
    })
  }

  test("CompressedLongs round-trips full-range longs across block edges") {
    check(Prop.forAllNoShrink(Gen.listOf(Gen.oneOf(Gen.long,
        Gen.oneOf(Long.MinValue, Long.MaxValue, 0L, -1L)))) { vs =>
      val bytes = CompressedColumnar.writeLongs(vs.toArray)
      val col = new CompressedLongs(wrap(bytes), 0)
      assert(col.length == vs.length)
      vs.zipWithIndex.foreach { case (v, i) => assert(col.get(i) == v) }
      true
    })
  }

  test("CompressedDoubles round-trips bit patterns incl. NaN/Inf/-0.0") {
    check(Prop.forAllNoShrink(Gen.listOf(Gen.oneOf(Gen.double,
        Gen.oneOf(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
          -0.0, Double.MinPositiveValue)))) { vs =>
      val bytes = CompressedColumnar.writeDoubles(vs.toArray)
      val col = new CompressedDoubles(wrap(bytes), 0)
      assert(col.length == vs.length)
      vs.zipWithIndex.foreach { case (v, i) =>
        assert(java.lang.Double.doubleToRawLongBits(col.get(i)) ==
          java.lang.Double.doubleToRawLongBits(v))
      }
      true
    })
  }

  test("GenericIndexed round-trips arbitrary byte elements incl. nulls/empties") {
    val elem = Gen.oneOf(
      Gen.const(null: Array[Byte]),
      Gen.const(Array.emptyByteArray),
      Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
    check(Prop.forAllNoShrink(Gen.listOf(elem)) { es =>
      val bytes = GenericIndexed.writeLengthPrefixed(es, sorted = false)
      val gi = new GenericIndexed(wrap(bytes), 0)
      assert(gi.numElements == es.length)
      es.zipWithIndex.foreach { case (e, i) =>
        val back = gi.bytesAt(i)
        if (e == null) assert(back == null)
        else assert(back != null && java.util.Arrays.equals(back, e))
      }
      // declared and offset-derived sizes agree on our own writes
      assert(gi.totalSize == bytes.length)
      true
    })
  }

  test("StringColumn round-trips unicode values and dictIdOf finds each") {
    val str = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.listOf(Gen.choose(0x20, 0x2FFF)).map(_.map(_.toChar).mkString),
      Gen.const("é中😀")) // é, 中, emoji (surrogate pair)
    check(Prop.forAllNoShrink(Gen.nonEmptyListOf(Gen.oneOf(str, Gen.const(null: String)))) { vs =>
      val bytes = StringColumn.write(vs, withBitmaps = true)
      val col = new StringColumn(wrap(bytes), 0, bytes.length)
      assert(col.length == vs.length)
      vs.zipWithIndex.foreach { case (v, i) => assert(col.stringAt(i) == v) }
      // every non-null value resolves through the sorted dictionary,
      // and its bitmap selects exactly the rows holding it
      vs.filter(_ != null).distinct.foreach { v =>
        val id = col.dictIdOf(v)
        assert(id >= 0, s"dictIdOf missed '$v'")
        val rows = col.bitmapFor(id).get
        val expected = vs.zipWithIndex.collect { case (x, i) if x == v => i }
        assert(rows.toArray.toSeq == expected)
      }
      true
    })
  }

  test("dictIdRangeForPrefix equals the naive startsWith filter") {
    val str = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.listOf(Gen.choose(0x20, 0x2FFF)).map(_.map(_.toChar).mkString),
      Gen.const("é中😀"))
    val gen = for {
      vs <- Gen.nonEmptyListOf(Gen.oneOf(str, Gen.const(null: String)))
      p <- Gen.oneOf(
        str.suchThat(_.nonEmpty),
        // prefixes OF actual values hit the interesting boundaries
        Gen.oneOf(vs).suchThat(v => v != null && v.nonEmpty)
          .flatMap(v => Gen.choose(1, v.length).map(v.take)))
    } yield (vs, p)
    // the reference predicate is BYTE-level startsWith: Spark's
    // UTF8String compares UTF-8 bytes too (a prefix that splits a
    // surrogate pair encodes its lone surrogate as '?', and neither
    // Spark nor the storage treats it as a char-level prefix)
    def bytesStartWith(v: String, p: Array[Byte]): Boolean = {
      val b = v.getBytes("UTF-8")
      b.length >= p.length &&
        java.util.Arrays.equals(b, 0, p.length, p, 0, p.length)
    }
    check(Prop.forAllNoShrink(gen) { case (vs, prefix) =>
      val bytes = StringColumn.write(vs, withBitmaps = true)
      val col = new StringColumn(wrap(bytes), 0, bytes.length)
      val (lo, hi) = col.dictIdRangeForPrefix(prefix)
      val inRange = (lo until hi)
        .map(col.dictionary.stringAt).toSet
      val p = prefix.getBytes("UTF-8")
      val expected = vs.filter(v => v != null && bytesStartWith(v, p)).toSet
      assert(inRange == expected, "prefix range mismatch")
      true
    })
  }

  test("StringMultiColumn round-trips arbitrary row shapes") {
    val row = Gen.oneOf(
      Gen.const(null: Seq[String]),
      Gen.const(Seq.empty[String]),
      Gen.nonEmptyListOf(Gen.oneOf(Gen.asciiPrintableStr,
        Gen.const(null: String))).map(_.toSeq))
    check(Prop.forAllNoShrink(Gen.nonEmptyListOf(row)) { rows =>
      val bytes = StringMultiColumn.write(rows)
      val col = new StringMultiColumn(wrap(bytes), 0, bytes.length)
      assert(col.length == rows.length)
      rows.zipWithIndex.foreach { case (r, i) =>
        if (r == null) assert(col.isNullAt(i))
        else {
          assert(!col.isNullAt(i))
          assert(col.valuesAt(i).toSeq == r)
        }
      }
      true
    })
  }

  test("FrontCodedIndexed round-trips arbitrary unicode value sets") {
    val gen = for {
      vs <- Gen.listOf(Gen.oneOf(
        Gen.asciiPrintableStr,
        Gen.identifier, // shared-prefix-heavy
        Gen.listOf(Gen.oneOf('a', 'b', 'é', '中')).map(_.mkString)))
      hasNull <- Gen.oneOf(true, false)
      bucket <- Gen.oneOf(1, 2, 4, 8, 16, 32, 64, 128)
    } yield (vs.distinct.sorted(StringColumn.utf8Order), hasNull, bucket)
    check(Prop.forAllNoShrink(gen) { case (vs, hasNull, bucket) =>
      val bytes = FrontCodedIndexed.write(
        vs.map(_.getBytes("UTF-8")), hasNull, bucket)
      val d = new FrontCodedIndexed(wrap(bytes), 0)
      val off = if (hasNull) 1 else 0
      assert(d.totalSize == bytes.length)
      assert(d.numElements == vs.length + off)
      if (hasNull) assert(d.bytesAt(0) == null)
      vs.zipWithIndex.foreach { case (v, i) =>
        assert(d.stringAt(i + off) == v, s"bucket=$bucket id=$i")
      }
      val all = d.allBytes
      assert(all.length == d.numElements)
      vs.zipWithIndex.foreach { case (v, i) =>
        assert(new String(all(i + off), "UTF-8") == v)
      }
      true
    })
  }
}
