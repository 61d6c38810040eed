package graft.format

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

/** Multi-value string dimension column -> Spark ArrayType(StringType).
  *
  * The v9 descriptor carries `hasMultipleValues` but the reference
  * never implements the decode (SURVEY.md §0 gap table;
  * reference src/segment/column_descriptor.rs:20-21 parses the flag and
  * drops it). This is our own layout in the same idiom as the
  * single-value column:
  * {{{
  * [version u8 = 0x04 | 0x05]
  * [dictionary: GenericIndexed (v4) | FrontCodedIndexed (v5)]
  * [flat ids: CompressedInts]       // all rows' values concatenated
  * [row ends: CompressedInts]       // cumulative value-count per row
  * }}}
  * Row r owns flat ids [ends[r-1], ends[r]).
  */
final class StringMultiColumn(buf: ByteBuffer, base: Int, end: Int = -1) {
  private val version = buf.get(base) & 0xff
  if (version != StringMultiColumn.VERSION &&
      version != StringMultiColumn.VERSION_FC)
    fail(f"StringMultiColumn: unsupported version 0x$version%02x")

  val dictionary: StringDict =
    if (version == StringMultiColumn.VERSION_FC)
      new FrontCodedIndexed(buf, base + 1)
    else new GenericIndexed(buf, base + 1)
  private val flatBase = base + 1 + dictionary.totalSize
  val flatIds = new CompressedInts(buf, flatBase)
  val rowEnds = new CompressedInts(buf, flatBase + flatIds.totalByteSize)

  /** Roaring set of rows that are NULL (as opposed to empty arrays) —
    * optional trailer, same shape as the numeric null trailers.
    */
  val nulls: org.roaringbitmap.buffer.ImmutableRoaringBitmap =
    NullTrailer.read(buf, flatBase + flatIds.totalByteSize + rowEnds.totalByteSize, end)

  def isNullAt(r: Int): Boolean = nulls != null && nulls.contains(r)

  def length: Int = rowEnds.length

  /** Value-range [start, end) of row r in the flat id list. */
  def rowRange(r: Int): (Int, Int) =
    (if (r == 0) 0 else rowEnds.get(r - 1), rowEnds.get(r))

  def valuesAt(r: Int): Array[String] = {
    val (s, e) = rowRange(r)
    Array.tabulate(e - s)(k => dictionary.stringAt(flatIds.get(s + k)))
  }

  def dictionaryBytes: Array[Array[Byte]] = dictionary.allBytes
}

object StringMultiColumn {
  val VERSION = 0x04
  /** Front-coded-dictionary variant (stringEncoding=frontCoded). */
  val VERSION_FC = 0x05

  def write(values: Seq[Seq[String]],
            frontCodedDict: Boolean = false): Array[Byte] = {
    val hasNull = values.exists(row => row != null && row.contains(null))
    val nullRows = values.zipWithIndex.collect { case (null, r) => r }
    val distinct = values.filter(_ != null).flatten.filter(_ != null).distinct.sorted(StringColumn.utf8Order)
    val dictValues: Seq[String] = (if (hasNull) Seq(null) else Nil) ++ distinct
    val dictIndex = dictValues.zipWithIndex.toMap

    val flat = scala.collection.mutable.ArrayBuffer[Int]()
    val ends = new Array[Int](values.size)
    values.zipWithIndex.foreach { case (row, r) =>
      if (row != null) row.foreach(v => flat += dictIndex(v))
      ends(r) = flat.size
    }

    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeByte(if (frontCodedDict) VERSION_FC else VERSION)
    if (frontCodedDict)
      out.write(FrontCodedIndexed.write(
        distinct.map(_.getBytes("UTF-8")), hasNull))
    else out.write(GenericIndexed.writeLengthPrefixed(
      dictValues.map(v => if (v == null) null else v.getBytes("UTF-8")), sorted = true))
    out.write(CompressedColumnar.writeInts(flat.toArray))
    out.write(CompressedColumnar.writeInts(ends))
    if (nullRows.nonEmpty) {
      val bm = new org.roaringbitmap.RoaringBitmap()
      nullRows.foreach(bm.add)
      bm.runOptimize()
      val b = new ByteArrayOutputStream()
      val d = new DataOutputStream(b)
      d.writeByte(0x01)
      bm.serialize(d)
      d.flush()
      out.write(GenericIndexed.writeLengthPrefixed(Seq(b.toByteArray), sorted = false))
    }
    out.flush(); bos.toByteArray
  }
}
