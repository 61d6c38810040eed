package graft.format

import java.nio.ByteBuffer

import net.jpountz.lz4.LZ4Factory

/** Block compression strategies (single id byte).
  * Reference: src/compression/mod.rs:5-46. ids: 0x00 LZF, 0x01 LZ4,
  * 0x02 Zstd, 0xFF uncompressed, 0xFE none.
  *
  * We decode LZ4 (lz4-java, ships with Spark), Zstd (zstd-jni, ships
  * with Spark), LZF (own codec below), and the two pass-through ids —
  * a strict superset of the reference, which errors on both Zstd and
  * LZF (src/compression/mod.rs:43-44).
  *
  * LZF blocks are chunked streams in the format Druid's LZF strategy
  * reads and writes (the public ning-compress / liblzf layout): each
  * chunk is `'Z' 'V' <type>` with big-endian lengths — type 0 =
  * `len(2B) + raw bytes`, type 1 = `compressedLen(2B) +
  * uncompressedLen(2B) + LZF-encoded data`, where the encoded data is
  * the liblzf literal-run / back-reference byte code.
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
    case LZF => lzfDecode(buf, srcPos, srcLen, dst, dstLen)
    case other => fail(f"unknown compression id 0x$other%02x")
  }

  /** Compress one block for the segment writer. */
  def compress(id: Byte, src: Array[Byte]): Array[Byte] = id match {
    case LZ4 => lz4.fastCompressor().compress(src)
    case UNCOMPRESSED | NONE => src
    case ZSTD => com.github.luben.zstd.Zstd.compress(src)
    case LZF => lzfEncode(src)
    case other => fail(f"cannot compress with strategy 0x$other%02x")
  }

  // ---- LZF chunk stream ----

  private val ChunkMax = 65535 // max uncompressed bytes per LZF chunk

  private def lzfDecode(buf: ByteBuffer, srcPos: Int, srcLen: Int,
                        dst: Array[Byte], dstLen: Int): Unit = {
    var sp = srcPos
    val end = srcPos + srcLen
    var dp = 0
    while (sp < end && dp < dstLen) {
      if (end - sp < 5 || buf.get(sp) != 'Z' || buf.get(sp + 1) != 'V')
        fail("corrupt LZF block: bad chunk magic")
      val typ = buf.get(sp + 2)
      val len1 = ((buf.get(sp + 3) & 0xff) << 8) | (buf.get(sp + 4) & 0xff)
      typ match {
        case 0 => // uncompressed chunk: len1 raw bytes
          if (sp + 5 + len1 > end || dp + len1 > dstLen)
            fail("corrupt LZF block: uncompressed chunk overruns")
          var i = 0
          while (i < len1) { dst(dp + i) = buf.get(sp + 5 + i); i += 1 }
          sp += 5 + len1
          dp += len1
        case 1 => // compressed chunk: len1 encoded bytes -> ulen output
          if (end - sp < 7) fail("corrupt LZF block: truncated chunk header")
          val ulen = ((buf.get(sp + 5) & 0xff) << 8) | (buf.get(sp + 6) & 0xff)
          if (sp + 7 + len1 > end || dp + ulen > dstLen)
            fail("corrupt LZF block: compressed chunk overruns")
          lzfDecodeRaw(buf, sp + 7, len1, dst, dp, ulen)
          sp += 7 + len1
          dp += ulen
        case other => fail(s"corrupt LZF block: chunk type $other")
      }
    }
    if (dp != dstLen) fail(s"LZF block decoded $dp bytes, expected $dstLen")
  }

  /** liblzf byte code: control < 0x20 is a literal run of control+1
    * bytes; otherwise a back-reference of length (control>>5)+2 (+extra
    * byte when the 3-bit length saturates at 7) at distance
    * ((control&0x1f)<<8 | next)+1. Overlapping copies are byte-serial
    * by definition (run-length-style self-extension).
    */
  private def lzfDecodeRaw(buf: ByteBuffer, start: Int, len: Int,
                           dst: Array[Byte], outPos: Int, outLen: Int): Unit = {
    var ip = start
    val iend = start + len
    var op = outPos
    val oend = outPos + outLen
    while (ip < iend) {
      val ctrl = buf.get(ip) & 0xff
      ip += 1
      if (ctrl < 0x20) {
        val run = ctrl + 1
        if (ip + run > iend || op + run > oend)
          fail("corrupt LZF data: literal run overruns")
        var i = 0
        while (i < run) { dst(op + i) = buf.get(ip + i); i += 1 }
        ip += run
        op += run
      } else {
        var mlen = ctrl >> 5
        if (mlen == 7) {
          if (ip >= iend) fail("corrupt LZF data: truncated match length")
          mlen += buf.get(ip) & 0xff
          ip += 1
        }
        mlen += 2
        if (ip >= iend) fail("corrupt LZF data: truncated match offset")
        var ref = op - (((ctrl & 0x1f) << 8) | (buf.get(ip) & 0xff)) - 1
        ip += 1
        if (ref < outPos || op + mlen > oend)
          fail("corrupt LZF data: match out of range")
        var i = 0
        while (i < mlen) { dst(op + i) = dst(ref + i); i += 1 }
        op += mlen
      }
    }
    if (op != oend) fail(s"LZF chunk decoded ${op - outPos} bytes, expected $outLen")
  }

  /** Greedy liblzf encoder over 3-byte hashes, emitted as 'ZV' chunks
    * (type 1 when encoding wins, type 0 otherwise) — the same stream
    * layout Druid's LZF strategy produces.
    */
  private def lzfEncode(src: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(src.length / 2 + 32)
    var cs = 0
    while (cs < src.length || src.isEmpty) {
      val clen = math.min(ChunkMax, src.length - cs)
      val enc = lzfEncodeRaw(src, cs, clen)
      if (enc != null && enc.length < clen) {
        out.write('Z'); out.write('V'); out.write(1)
        out.write(enc.length >> 8); out.write(enc.length & 0xff)
        out.write(clen >> 8); out.write(clen & 0xff)
        out.write(enc, 0, enc.length)
      } else {
        out.write('Z'); out.write('V'); out.write(0)
        out.write(clen >> 8); out.write(clen & 0xff)
        out.write(src, cs, clen)
      }
      cs += clen
      if (src.isEmpty) return out.toByteArray // one empty chunk
    }
    out.toByteArray
  }

  private def lzfEncodeRaw(src: Array[Byte], off: Int, len: Int): Array[Byte] = {
    if (len < 4) return null
    val out = new Array[Byte](len - 1) // give up unless we actually shrink
    val tab = new Array[Int](1 << 14)
    java.util.Arrays.fill(tab, -1)
    def hash(p: Int): Int =
      (((src(p) & 0xff) << 16 | (src(p + 1) & 0xff) << 8 | (src(p + 2) & 0xff)) * 2654435761L >>> 18).toInt & 0x3fff
    var ip = off
    val iend = off + len
    var op = 0
    var litStart = off
    def flushLits(upTo: Int): Boolean = {
      var s = litStart
      while (s < upTo) {
        val run = math.min(32, upTo - s)
        if (op + 1 + run > out.length) return false
        out(op) = (run - 1).toByte
        op += 1
        System.arraycopy(src, s, out, op, run)
        op += run
        s += run
      }
      litStart = upTo
      true
    }
    while (ip + 2 < iend) {
      val h = hash(ip)
      val ref = tab(h)
      tab(h) = ip
      val dist = ip - ref - 1
      if (ref >= off && dist < 8192 && ref + 2 < iend &&
          src(ref) == src(ip) && src(ref + 1) == src(ip + 1) && src(ref + 2) == src(ip + 2)) {
        var mlen = 3
        val maxLen = math.min(iend - ip, 264) // 7 + 255 + 2
        while (mlen < maxLen && src(ref + mlen) == src(ip + mlen)) mlen += 1
        if (!flushLits(ip)) return null
        val stored = mlen - 2
        if (stored <= 6) {
          if (op + 2 > out.length) return null
          out(op) = ((stored << 5) | (dist >> 8)).toByte
          op += 1
        } else {
          if (op + 3 > out.length) return null
          out(op) = ((7 << 5) | (dist >> 8)).toByte
          out(op + 1) = (stored - 7).toByte
          op += 2
        }
        out(op) = (dist & 0xff).toByte
        op += 1
        ip += mlen
        litStart = ip
      } else ip += 1
    }
    if (!flushLits(iend)) return null
    java.util.Arrays.copyOf(out, op)
  }
}
