package graft.format

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

/** Dictionary-encoded string column.
  *
  * Layout (reference src/column/string.rs:14-44):
  * {{{
  * [version u8]  0x00 legacy | 0x02 compressed | 0x03 compressed+features
  * [flags/featureMask i32]   (v2/v3 only)
  * [dictionary: GenericIndexed, length-prefixed elements, null = len -1]
  * [ids: VSizeInts (v0) | CompressedInts (v2/v3)]
  * }}}
  *
  * We keep dictionary and ids SEPARATE (the reference eagerly gathers
  * ids->dict into a materialized StringArray, src/column/string.rs:116-125).
  * Exposing the indirection lets the DSv2 reader hand Spark a dictionary
  * ColumnVector — per-row work is an int copy, and equality predicates
  * can be evaluated against the dictionary once per segment.
  */
final class StringColumn(buf: ByteBuffer, base: Int) {
  private val version = buf.get(base) & 0xff
  private val dictBase = version match {
    case 0x00 => base + 1
    case 0x02 | 0x03 => base + 5 // version(1) + flags/featureMask(4)
    case other => fail(f"String column: unsupported version 0x$other%02x")
  }

  val dictionary = new GenericIndexed(buf, dictBase)
  val ids: ColumnarInts = version match {
    case 0x00 => new VSizeInts(buf, dictBase + dictionary.totalSize)
    case _ => new CompressedInts(buf, dictBase + dictionary.totalSize)
  }

  def length: Int = ids.length

  /** Dictionary lookup for row i (null when dict entry is null). */
  def stringAt(i: Int): String = dictionary.stringAt(ids.get(i))

  /** Materialized dictionary as UTF-8 byte arrays (null entries stay
    * null) — decoded once per column per partition by the scan.
    */
  def dictionaryBytes: Array[Array[Byte]] =
    Array.tabulate(dictionary.numElements)(dictionary.bytesAt)
}

object StringColumn {
  /** Write a v2 string column: sorted unique dictionary (null first if
    * present, as Druid sorts nulls first) + LZ4-compressed id column.
    */
  def write(values: Seq[String]): Array[Byte] = {
    val hasNull = values.contains(null)
    val distinct = values.filter(_ != null).distinct.sorted
    val dictValues: Seq[String] = (if (hasNull) Seq(null) else Nil) ++ distinct
    val dictIndex = dictValues.zipWithIndex.toMap
    val ids = values.map(dictIndex).toArray

    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeByte(0x02)
    out.writeInt(0) // flags
    out.write(GenericIndexed.writeLengthPrefixed(
      dictValues.map(v => if (v == null) null else v.getBytes("UTF-8")), sorted = true))
    out.write(CompressedColumnar.writeInts(ids))
    out.flush(); bos.toByteArray
  }

  /** Write the legacy v0 layout (dictionary + VSizeInts ids) — exercised
    * in tests to cover the v0 decode path.
    */
  def writeV0(values: Seq[String]): Array[Byte] = {
    val hasNull = values.contains(null)
    val distinct = values.filter(_ != null).distinct.sorted
    val dictValues: Seq[String] = (if (hasNull) Seq(null) else Nil) ++ distinct
    val dictIndex = dictValues.zipWithIndex.toMap
    val ids = values.map(dictIndex)

    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeByte(0x00)
    out.write(GenericIndexed.writeLengthPrefixed(
      dictValues.map(v => if (v == null) null else v.getBytes("UTF-8")), sorted = true))
    out.write(VSizeInts.write(ids,
      VSizeInts.bytesNeeded(math.max(0, dictValues.size - 1))))
    out.flush(); bos.toByteArray
  }
}
