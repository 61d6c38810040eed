package graft.format

import java.nio.ByteBuffer

import net.jpountz.lz4.LZ4Factory

/** Block compression strategies (single id byte).
  * Reference: src/compression/mod.rs:5-46. ids: 0x00 LZF, 0x01 LZ4,
  * 0x02 Zstd, 0xFF uncompressed, 0xFE none.
  *
  * We decode LZ4 (lz4-java, ships with Spark), Zstd (zstd-jni, ships
  * with Spark — the reference errors on it), and the two pass-through
  * ids; LZF stays unsupported (legacy, nothing writes it since 2013).
  */
object Compression {
  val LZF: Byte = 0x00
  val LZ4: Byte = 0x01
  val ZSTD: Byte = 0x02
  val UNCOMPRESSED: Byte = 0xff.toByte
  val NONE: Byte = 0xfe.toByte

  private val lz4 = LZ4Factory.fastestInstance()

  /** Test hook: data blocks decompressed per JVM — lets specs assert
    * that metadata-answered queries decode NOTHING.
    */
  val blocksDecoded = new java.util.concurrent.atomic.AtomicLong(0)

  /** Decompress one block from `buf[srcPos, srcPos+srcLen)` into `dst`
    * (exactly `dstLen` bytes — block containers know the decoded size).
    */
  def decompress(id: Byte, buf: ByteBuffer, srcPos: Int, srcLen: Int,
                 dst: Array[Byte], dstLen: Int): Unit = {
    blocksDecoded.incrementAndGet()
    decompress0(id, buf, srcPos, srcLen, dst, dstLen)
  }

  private def decompress0(id: Byte, buf: ByteBuffer, srcPos: Int, srcLen: Int,
                          dst: Array[Byte], dstLen: Int): Unit = id match {
    case LZ4 =>
      val srcDup = buf.duplicate()
      srcDup.position(srcPos).limit(srcPos + srcLen)
      lz4.fastDecompressor().decompress(srcDup, srcPos, ByteBuffer.wrap(dst), 0, dstLen)
    case UNCOMPRESSED | NONE =>
      if (srcLen < dstLen) fail(s"uncompressed block too short: $srcLen < $dstLen")
      val dup = buf.duplicate()
      dup.position(srcPos)
      dup.get(dst, 0, dstLen)
    case ZSTD =>
      val src = new Array[Byte](srcLen)
      val dup = buf.duplicate()
      dup.position(srcPos)
      dup.get(src)
      val n = com.github.luben.zstd.Zstd.decompress(dst, src)
      if (n != dstLen) fail(s"zstd block decoded $n bytes, expected $dstLen")
    case LZF => fail("LZF compression is not supported")
    case other => fail(f"unknown compression id 0x$other%02x")
  }

  /** Compress one block for the segment writer. */
  def compress(id: Byte, src: Array[Byte]): Array[Byte] = id match {
    case LZ4 => lz4.fastCompressor().compress(src)
    case UNCOMPRESSED | NONE => src
    case ZSTD => com.github.luben.zstd.Zstd.compress(src)
    case other => fail(f"cannot compress with strategy 0x$other%02x")
  }
}
