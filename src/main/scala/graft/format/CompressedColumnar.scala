package graft.format

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

/** Block-compressed scalar containers:
  *  - CompressedColumnarInts v0x02: [ver][totalSize i32][sizePer i32]
  *    [numBytes u8][compression u8][GenericIndexed of compressed blocks]
  *    (reference src/column/compressed_ints.rs:13-21)
  *  - CompressedColumnarLongs v0x01 (LZF implied) / v0x02 (explicit
  *    compression byte): [ver][totalSize][sizePer][(v2) compression][GI]
  *    (reference src/column/compressed_longs.rs:11-21)
  *  - CompressedColumnarDoubles / Floats: same shape as longs with f64/f32
  *    elements (reference src/column/compressed_doubles.rs).
  *
  * Blocks are length-prefixed GenericIndexed elements; each decodes to
  * `sizePer` big-endian values except a possibly-short last block
  * (reference src/column/compressed_longs.rs:99-101).
  *
  * Unlike the reference's whole-column `decompress_all`, these readers
  * decode one block at a time with a single cached block — sequential
  * scans decompress each block exactly once, and a reader positioned at
  * a row range only touches the blocks covering it (the unit of
  * intra-segment split parallelism for the DSv2 connector).
  */
abstract class CompressedColumnar(buf: ByteBuffer, base: Int,
                                  elemSize: Int, hasNumBytes: Boolean) {
  private val version = buf.get(base) & 0xff
  if (version != 0x01 && version != 0x02)
    fail(f"CompressedColumnar: unsupported version 0x$version%02x")
  private val minHeader = if (hasNumBytes) 11 else if (version == 0x01) 9 else 10
  if (buf.capacity() - base < minHeader)
    fail(s"CompressedColumnar: ${buf.capacity() - base} bytes, need >= $minHeader")
  val totalSize: Int = buf.getInt(base + 1)
  val sizePer: Int = buf.getInt(base + 5)
  protected val numBytes: Int = if (hasNumBytes) buf.get(base + 9) & 0xff else elemSize
  val compression: Byte = version match {
    case 0x01 if !hasNumBytes => Compression.LZF // legacy V1: LZF implied
    case 0x02 => buf.get(base + (if (hasNumBytes) 10 else 9))
    case other => fail(f"CompressedColumnar: unsupported version 0x$other%02x")
  }
  private val blocksBase = base + (if (hasNumBytes) 11 else if (version == 0x01) 9 else 10)
  protected val blocks = new GenericIndexed(buf, blocksBase)

  val blockCount: Int = blocks.numElements
  def length: Int = totalSize

  /** One reusable decode buffer + its big-endian view. */
  protected val blockBytes = new Array[Byte](math.max(1, sizePer * numBytes))
  protected val blockView: ByteBuffer = ByteBuffer.wrap(blockBytes)
  private var cachedBlock = -1

  def valuesInBlock(blockIdx: Int): Int =
    math.min(sizePer, totalSize - blockIdx * sizePer)

  /** Decode block `blockIdx` into `blockBytes` (cached). */
  protected def ensureBlock(blockIdx: Int): Unit = {
    if (cachedBlock != blockIdx) {
      val (s, e) = blocks.elementRange(blockIdx)
      val len = buf.getInt(s)
      if (len < 0) fail(s"CompressedColumnar: null block $blockIdx")
      Compression.decompress(compression, buf, s + 4, len,
        blockBytes, valuesInBlock(blockIdx) * numBytes)
      cachedBlock = blockIdx
    }
  }

  @inline protected final def position(i: Int): Int = {
    val b = i / sizePer
    ensureBlock(b)
    (i - b * sizePer) * numBytes
  }

  /** Structure size in bytes, for chaining compound column layouts. */
  def totalByteSize: Int = blocksBase - base + blocks.totalSize
}

final class CompressedLongs(buf: ByteBuffer, base: Int)
    extends CompressedColumnar(buf, base, 8, hasNumBytes = false) {
  def get(i: Int): Long = blockView.getLong(position(i))
}

final class CompressedDoubles(buf: ByteBuffer, base: Int)
    extends CompressedColumnar(buf, base, 8, hasNumBytes = false) {
  def get(i: Int): Double = blockView.getDouble(position(i))
}

final class CompressedFloats(buf: ByteBuffer, base: Int)
    extends CompressedColumnar(buf, base, 4, hasNumBytes = false) {
  def get(i: Int): Float = blockView.getFloat(position(i))
}

final class CompressedInts(buf: ByteBuffer, base: Int)
    extends CompressedColumnar(buf, base, 4, hasNumBytes = true)
    with ColumnarInts {
  def get(i: Int): Int = {
    var p = position(i)
    var v = 0
    var k = 0
    while (k < numBytes) { v = (v << 8) | (blockBytes(p) & 0xff); p += 1; k += 1 }
    v
  }
}

object CompressedColumnar {
  /** Druid-like defaults: 64KB blocks (0x2000 longs, 0x4000 floats). */
  def defaultSizePer(elemSize: Int): Int = 0x10000 / elemSize

  private def writeHeader(out: DataOutputStream, totalSize: Int, sizePer: Int,
                          numBytes: Option[Int], compression: Byte): Unit = {
    out.writeByte(0x02)
    out.writeInt(totalSize)
    out.writeInt(sizePer)
    numBytes.foreach(out.writeByte)
    out.writeByte(compression)
  }

  private def writeBlocks(values: Int, sizePer: Int, compression: Byte,
                          fill: (ByteBuffer, Int, Int) => Unit,
                          elemBytes: Int): Array[Byte] = {
    val nBlocks = (values + sizePer - 1) / sizePer
    val blocks = (0 until nBlocks).map { b =>
      val n = math.min(sizePer, values - b * sizePer)
      val raw = new Array[Byte](n * elemBytes)
      fill(ByteBuffer.wrap(raw), b * sizePer, n)
      Compression.compress(compression, raw)
    }
    GenericIndexed.writeRawWithLengthPrefix(blocks, sorted = false)
  }

  def writeLongs(values: Array[Long], compression: Byte = Compression.LZ4,
                 sizePer: Int = defaultSizePer(8)): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    writeHeader(out, values.length, sizePer, None, compression)
    out.write(writeBlocks(values.length, sizePer, compression,
      (bb, start, n) => { var i = 0; while (i < n) { bb.putLong(values(start + i)); i += 1 } }, 8))
    out.flush(); bos.toByteArray
  }

  def writeDoubles(values: Array[Double], compression: Byte = Compression.LZ4,
                   sizePer: Int = defaultSizePer(8)): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    writeHeader(out, values.length, sizePer, None, compression)
    out.write(writeBlocks(values.length, sizePer, compression,
      (bb, start, n) => { var i = 0; while (i < n) { bb.putDouble(values(start + i)); i += 1 } }, 8))
    out.flush(); bos.toByteArray
  }

  def writeFloats(values: Array[Float], compression: Byte = Compression.LZ4,
                  sizePer: Int = defaultSizePer(4)): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    writeHeader(out, values.length, sizePer, None, compression)
    out.write(writeBlocks(values.length, sizePer, compression,
      (bb, start, n) => { var i = 0; while (i < n) { bb.putFloat(values(start + i)); i += 1 } }, 4))
    out.flush(); bos.toByteArray
  }

  def writeInts(values: Array[Int], compression: Byte = Compression.LZ4,
                sizePerOpt: Option[Int] = None): Array[Byte] = {
    val numBytes = VSizeInts.bytesNeeded(if (values.isEmpty) 0 else values.max)
    val sizePer = sizePerOpt.getOrElse(0x10000 / numBytes)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    writeHeader(out, values.length, sizePer, Some(numBytes), compression)
    // pack at numBytes width, big-endian
    val nBlocks = (values.length + sizePer - 1) / sizePer
    val blocks = (0 until nBlocks).map { b =>
      val n = math.min(sizePer, values.length - b * sizePer)
      val raw = new Array[Byte](n * numBytes)
      var i = 0
      while (i < n) {
        val v = values(b * sizePer + i)
        var k = 0
        while (k < numBytes) {
          raw(i * numBytes + k) = ((v >>> ((numBytes - 1 - k) * 8)) & 0xff).toByte
          k += 1
        }
        i += 1
      }
      Compression.compress(compression, raw)
    }
    out.write(GenericIndexed.writeRawWithLengthPrefix(blocks, sorted = false))
    out.flush(); bos.toByteArray
  }
}
