package graft.format

import org.roaringbitmap.buffer.{ImmutableRoaringBitmap, MutableRoaringBitmap}

/** CONCISE (Compressed 'n' Composable Integer Set) bitmap codec — the
  * legacy Druid bitmap encoding (type byte 0x00 in the serialized
  * section; the reference declares it and errors out,
  * src/column/bitmap.rs:7,32-34). Pre-2020 Druid deployments default
  * to it, so a migrating shop's old segments carry Concise sections;
  * without this decoder every bitmap pushdown tier (equality / IN /
  * prefix / LIKE / bounds / search) silently degrades to residual-only
  * scans on those segments.
  *
  * Word layout (CONCISE paper, Colantonio & Di Pietro 2010; Druid's
  * extendedset implementation), 32-bit big-endian words:
  *  - literal: MSB = 1, bits 0..30 are 31 uncompressed bits — bit i
  *    set means integer `31*block + i` is present;
  *  - 0-fill:  bits 31..30 = 00 — a run of all-zero 31-bit blocks;
  *  - 1-fill:  bits 31..30 = 01 — a run of all-one 31-bit blocks;
  *  - fill words carry a 5-bit "position" field in bits 25..29: 0 =
  *    plain fill; p>0 = the fill's FIRST block has bit p-1 FLIPPED
  *    (set within a 0-fill, clear within a 1-fill) — the "mixed fill"
  *    that lets one outlier bit ride a run without a literal word;
  *  - bits 0..24 hold n; the fill spans n+1 blocks.
  *
  * Decoding materializes to Roaring (the engine's in-memory bitmap
  * algebra); encoding exists so round-trip tests are self-contained
  * offline — it emits plain fills + literals (valid CONCISE, not
  * maximally compacted).
  */
object Concise {

  /** Decode CONCISE words into a Roaring bitmap of set integers. */
  def decode(words: Array[Int]): MutableRoaringBitmap = {
    val out = new MutableRoaringBitmap()
    var block = 0L // index of the next 31-bit block
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if ((w & 0x80000000) != 0) { // literal
        var bits = w & 0x7FFFFFFF
        val base = block * 31
        while (bits != 0) {
          out.add((base + java.lang.Integer.numberOfTrailingZeros(bits)).toInt)
          bits &= bits - 1
        }
        block += 1
      } else {
        val ones = (w & 0x40000000) != 0
        val p = (w >>> 25) & 0x1F
        val blocks = (w & 0x01FFFFFF).toLong + 1
        val base = block * 31
        if (ones) {
          out.add(base, base + blocks * 31) // [start, end)
          if (p != 0) out.remove((base + p - 1).toInt)
        } else if (p != 0) out.add((base + p - 1).toInt)
        block += blocks
      }
      wi += 1
    }
    out
  }

  /** Decode a serialized section (big-endian int words) in `buf`
    * between byte offsets [start, end). */
  def decode(buf: java.nio.ByteBuffer, start: Int, end: Int): MutableRoaringBitmap = {
    val n = (end - start) / 4
    val words = new Array[Int](n)
    var i = 0
    while (i < n) { words(i) = buf.getInt(start + i * 4); i += 1 }
    decode(words)
  }

  private val MaxFillBlocks = 1 << 25 // 25-bit n field, n+1 blocks

  /** Encode a row set as CONCISE words: a 0-fill for each block gap, a
    * literal for each occupied block (an all-ones literal is valid
    * CONCISE; the compaction into 1-fills/mixed fills that real Druid
    * performs is an encoder freedom, not a format requirement). */
  def encode(rows: ImmutableRoaringBitmap): Array[Int] = {
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    var nextBlock = 0L
    def gapFill(toBlock: Long): Unit = {
      var gap = toBlock - nextBlock
      while (gap > 0) {
        val chunk = math.min(gap, MaxFillBlocks.toLong)
        out += (chunk - 1).toInt // 0-fill, no flipped bit
        gap -= chunk
      }
      nextBlock = toBlock
    }
    var curBlock = -1L
    var mask = 0
    def flush(): Unit = if (curBlock >= 0) {
      gapFill(curBlock)
      out += (0x80000000 | mask)
      nextBlock = curBlock + 1
      curBlock = -1; mask = 0
    }
    val it = rows.getIntIterator
    while (it.hasNext) {
      val v = it.next() & 0xFFFFFFFFL
      val b = v / 31
      if (b != curBlock) { flush(); curBlock = b }
      mask |= 1 << (v % 31).toInt
    }
    flush()
    out.toArray
  }

  private val FullBlock = 0x7FFFFFFF // all 31 payload bits set

  /** Compacting encoder: emits 1-fills for all-ones runs and MIXED
    * fills (position field p > 0) when a run's first block is one bit
    * away from the fill value — a lone set bit leading a zero run, a
    * lone clear bit leading a ones run — the compactions real Druid's
    * extendedset performs. This is the writer the segment path uses,
    * so round-trip tests exercise the decoder's fill-with-flip
    * branches with generated data, not just hand vectors.
    */
  def encodeCompact(rows: ImmutableRoaringBitmap): Array[Int] = {
    if (rows.isEmpty) return Array.emptyIntArray
    val lastBlock = ((rows.last() & 0xFFFFFFFFL) / 31).toInt
    val masks = new Array[Int](lastBlock + 1)
    val it = rows.getIntIterator
    while (it.hasNext) {
      val v = it.next() & 0xFFFFFFFFL
      masks((v / 31).toInt) |= 1 << (v % 31).toInt
    }
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    def emitFill(ones: Boolean, p: Int, blocks: Long): Unit = {
      // the flip applies to the FIRST block only: emit it in the first
      // chunk; continuation chunks are plain fills
      var rest = blocks
      var flip = p
      while (rest > 0) {
        val chunk = math.min(rest, MaxFillBlocks.toLong)
        out += ((if (ones) 0x40000000 else 0) | (flip << 25) |
          (chunk - 1).toInt)
        flip = 0
        rest -= chunk
      }
    }
    var i = 0
    while (i <= lastBlock) {
      val m = masks(i)
      def runOf(value: Int, from: Int): Int = {
        var j = from
        while (j <= lastBlock && masks(j) == value) j += 1
        j - from
      }
      if (m == 0) {
        val run = runOf(0, i)
        emitFill(ones = false, p = 0, blocks = run.toLong)
        i += run
      } else if (m == FullBlock) {
        val run = runOf(FullBlock, i)
        emitFill(ones = true, p = 0, blocks = run.toLong)
        i += run
      } else if (java.lang.Integer.bitCount(m) == 1 && i < lastBlock &&
          masks(i + 1) == 0) {
        // lone set bit then a zero run: mixed 0-fill
        val run = 1 + runOf(0, i + 1)
        emitFill(ones = false,
          p = java.lang.Integer.numberOfTrailingZeros(m) + 1,
          blocks = run.toLong)
        i += run
      } else if (java.lang.Integer.bitCount(m) == 30 && i < lastBlock &&
          masks(i + 1) == FullBlock) {
        // lone clear bit then a ones run: mixed 1-fill
        val run = 1 + runOf(FullBlock, i + 1)
        emitFill(ones = true,
          p = java.lang.Integer.numberOfTrailingZeros(~m & FullBlock) + 1,
          blocks = run.toLong)
        i += run
      } else {
        out += (0x80000000 | m)
        i += 1
      }
    }
    out.toArray
  }

  /** Serialize to the section payload: big-endian int words (the
    * compacting encoder — fills, mixed fills, literals). */
  def toBytes(rows: ImmutableRoaringBitmap): Array[Byte] = {
    val words = encodeCompact(rows)
    val bb = java.nio.ByteBuffer.allocate(words.length * 4)
    words.foreach(bb.putInt)
    bb.array()
  }
}
