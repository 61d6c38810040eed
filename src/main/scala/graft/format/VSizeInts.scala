package graft.format

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

/** Unsigned ints packed at a fixed 1-4 byte width, big-endian.
  * Reference: src/column/vsize_ints.rs:12-27.
  * Layout: [version u8 = 0x00][numBytes u8][bufferSize i32][packed values]
  */
final class VSizeInts(buf: ByteBuffer, base: Int) extends ColumnarInts {
  private val version = buf.get(base) & 0xff
  if (version != VSizeInts.VERSION) fail(s"VSizeInts: bad version $version")
  val numBytes: Int = buf.get(base + 1) & 0xff
  if (numBytes < 1 || numBytes > 4) fail(s"VSizeInts: invalid numBytes $numBytes")
  private val bufferSize = buf.getInt(base + 2)
  val length: Int = bufferSize / numBytes
  private val valuesStart = base + VSizeInts.HEADER

  def get(i: Int): Int = {
    var v = 0
    var p = valuesStart + i * numBytes
    var k = 0
    while (k < numBytes) { v = (v << 8) | (buf.get(p) & 0xff); p += 1; k += 1 }
    v
  }

  def totalSize: Int = VSizeInts.HEADER + bufferSize
}

object VSizeInts {
  val VERSION = 0x00
  val HEADER = 6

  def wrap(data: Array[Byte]): VSizeInts = new VSizeInts(ByteBuffer.wrap(data), 0)

  def bytesNeeded(maxValue: Int): Int =
    if (maxValue < (1 << 8)) 1
    else if (maxValue < (1 << 16)) 2
    else if (maxValue < (1 << 24)) 3
    else 4

  def write(values: Seq[Int], numBytes: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeByte(VERSION)
    out.writeByte(numBytes)
    out.writeInt(values.size * numBytes)
    values.foreach { v =>
      var k = numBytes - 1
      while (k >= 0) { out.writeByte((v >>> (k * 8)) & 0xff); k -= 1 }
    }
    out.flush()
    bos.toByteArray
  }
}

/** Common shape of the two dictionary-id containers (VSize v0,
  * CompressedColumnarInts v2) so the string column reader and the DSv2
  * scan can consume either.
  */
trait ColumnarInts {
  def length: Int
  def get(i: Int): Int
}
