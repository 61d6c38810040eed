package graft.format

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

/** What a string column needs from its dictionary — implemented by
  * [[GenericIndexed]] (plain length-prefixed, the reference's only
  * dictionary shape, src/column/string.rs:14-44) and
  * [[FrontCodedIndexed]] (prefix-compressed buckets). Entries are
  * sorted by unsigned UTF-8 byte order, null (id 0) first.
  */
trait StringDict {
  def numElements: Int
  /** Bytes the structure occupies — for chaining compound layouts. */
  def totalSize: Int
  /** UTF-8 bytes of entry i; null for the null entry. */
  def bytesAt(i: Int): Array[Byte]
  def stringAt(i: Int): String
  /** All entries in id order, lazily — O(1) amortized per entry on
    * both dictionary shapes (front coding overrides this with a
    * per-bucket sequential decode). Full-dictionary scans should use
    * this instead of per-id random access, which costs O(bucketSize)
    * per entry on front-coded dictionaries, and instead of
    * [[allBytes]], which pins every entry on heap at once.
    */
  def entriesIterator: Iterator[Array[Byte]] =
    (0 until numElements).iterator.map(bytesAt)

  /** All entries in id order, materialized (the dictionary-vector
    * path, which needs the array anyway).
    */
  def allBytes: Array[Array[Byte]] = entriesIterator.toArray
}

/** Front-coded string dictionary: sorted values grouped into buckets of
  * `bucketSize`; each bucket stores its first value whole and every
  * later value as (shared-prefix-length with the PREVIOUS value,
  * suffix) — the incremental front coding of Apache Druid's
  * `FrontCodedIndexed` (its `stringEncodingStrategy: frontCoded`
  * option, absent from the reference — neither src/column/string.rs
  * nor bitmap.rs mentions it). Sorted dictionaries share long runs of
  * prefixes, so this typically shrinks the dictionary several-fold
  * while keeping O(bucketSize) random access and the binary-search
  * property (bucket heads are in sorted order).
  *
  * This is OUR serialization of that algorithm (byte parity with real
  * Druid's is unverifiable offline — no public fixture survives with a
  * front-coded dictionary):
  * {{{
  * [version u8 = 0x01]
  * [bucketSize u8]            (power of two, 1..128)
  * [hasNull u8]               (null is id 0, stored out of band)
  * [numValues i32]            (non-null count)
  * [blobLen i32]
  * [bucketEnds i32 x nBuckets] (END offset of each bucket in the blob)
  * [blob: per bucket: vbyte(len) head | vbyte(prefixLen) vbyte(suffixLen) suffix ...]
  * }}}
  * vbyte = unsigned LEB128. `nBuckets = ceil(numValues / bucketSize)`.
  */
final class FrontCodedIndexed(buf: ByteBuffer, base: Int) extends StringDict {
  private val version = buf.get(base) & 0xff
  if (version != FrontCodedIndexed.VERSION)
    fail(f"FrontCodedIndexed: bad version 0x$version%02x")
  val bucketSize: Int = buf.get(base + 1) & 0xff
  if (bucketSize < 1 || bucketSize > 128 ||
      (bucketSize & (bucketSize - 1)) != 0)
    fail(s"FrontCodedIndexed: bad bucket size $bucketSize")
  private val hasNull = (buf.get(base + 2) & 0xff) != 0
  val numValues: Int = buf.getInt(base + 3)
  if (numValues < 0) fail(s"FrontCodedIndexed: negative count $numValues")
  private val blobLen = buf.getInt(base + 7)
  private val nBuckets = (numValues + bucketSize - 1) / bucketSize
  private val offsetsStart = base + FrontCodedIndexed.HEADER
  private val blobStart = offsetsStart + nBuckets * 4

  def numElements: Int = numValues + (if (hasNull) 1 else 0)
  def totalSize: Int = FrontCodedIndexed.HEADER + nBuckets * 4 + blobLen

  private def bucketEnd(b: Int): Int = buf.getInt(offsetsStart + b * 4)
  private def bucketStart(b: Int): Int =
    if (b == 0) 0 else bucketEnd(b - 1)

  /** Read an unsigned LEB128 int at pos; returns (value, nextPos). */
  private def vbyte(pos: Int): (Int, Int) = {
    var v = 0
    var shift = 0
    var p = pos
    var b = 0
    do {
      b = buf.get(p) & 0xff
      v |= (b & 0x7f) << shift
      shift += 7
      p += 1
    } while ((b & 0x80) != 0)
    (v, p)
  }

  private def sliceBytes(pos: Int, len: Int): Array[Byte] = {
    val out = new Array[Byte](len)
    val dup = buf.duplicate()
    dup.position(pos)
    dup.get(out)
    out
  }

  /** Decode the first `upTo + 1` values of bucket b, returning the last
    * one — O(bucketSize) like Druid's bucket scan.
    */
  private def decodeInBucket(b: Int, upTo: Int): Array[Byte] = {
    var p = blobStart + bucketStart(b)
    val (headLen, p1) = vbyte(p)
    var prev = sliceBytes(p1, headLen)
    p = p1 + headLen
    var k = 0
    while (k < upTo) {
      val (prefixLen, p2) = vbyte(p)
      val (suffixLen, p3) = vbyte(p2)
      val v = new Array[Byte](prefixLen + suffixLen)
      System.arraycopy(prev, 0, v, 0, prefixLen)
      val dup = buf.duplicate()
      dup.position(p3)
      dup.get(v, prefixLen, suffixLen)
      p = p3 + suffixLen
      prev = v
      k += 1
    }
    prev
  }

  def bytesAt(i: Int): Array[Byte] = {
    if (i < 0 || i >= numElements) fail(s"FrontCodedIndexed: id $i out of range")
    if (hasNull && i == 0) return null
    val vi = i - (if (hasNull) 1 else 0)
    decodeInBucket(vi / bucketSize, vi % bucketSize)
  }

  def stringAt(i: Int): String = {
    val b = bytesAt(i)
    if (b == null) null else new String(b, UTF_8)
  }

  /** Decode one whole bucket sequentially — O(bucket bytes). */
  private def decodeBucket(b: Int): Array[Array[Byte]] = {
    val count = math.min(bucketSize, numValues - b * bucketSize)
    val out = new Array[Array[Byte]](count)
    var p = blobStart + bucketStart(b)
    val (headLen, p1) = vbyte(p)
    var prev = sliceBytes(p1, headLen)
    p = p1 + headLen
    out(0) = prev
    var k = 1
    while (k < count) {
      val (prefixLen, p2) = vbyte(p)
      val (suffixLen, p3) = vbyte(p2)
      val v = new Array[Byte](prefixLen + suffixLen)
      System.arraycopy(prev, 0, v, 0, prefixLen)
      val dup = buf.duplicate()
      dup.position(p3)
      dup.get(v, prefixLen, suffixLen)
      p = p3 + suffixLen
      out(k) = v
      prev = v
      k += 1
    }
    out
  }

  /** Lazy sequential walk, one decoded bucket in memory at a time —
    * full-dictionary scans pay O(n) total instead of O(n x bucketSize)
    * random accesses, without materializing the whole dictionary.
    */
  override def entriesIterator: Iterator[Array[Byte]] = {
    val nullIt: Iterator[Array[Byte]] =
      if (hasNull) Iterator.single(null) else Iterator.empty
    nullIt ++ (0 until nBuckets).iterator.flatMap(decodeBucket)
  }
}

object FrontCodedIndexed {
  val VERSION = 0x01
  val HEADER = 11 // version(1) + bucketSize(1) + hasNull(1) + count(4) + blobLen(4)

  private def writeVbyte(out: ByteArrayOutputStream, value: Int): Unit = {
    var v = value
    while ((v & ~0x7f) != 0) {
      out.write((v & 0x7f) | 0x80)
      v >>>= 7
    }
    out.write(v)
  }

  private def commonPrefix(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n && a(i) == b(i)) i += 1
    i
  }

  /** Serialize a SORTED (unsigned UTF-8 byte order) distinct non-null
    * value list; `hasNull` prepends the out-of-band null as id 0.
    */
  def write(values: Seq[Array[Byte]], hasNull: Boolean,
            bucketSize: Int = 16): Array[Byte] = {
    require(bucketSize >= 1 && bucketSize <= 128 &&
      (bucketSize & (bucketSize - 1)) == 0, s"bad bucket size $bucketSize")
    val blob = new ByteArrayOutputStream()
    val ends = new ByteArrayOutputStream()
    val endsOut = new java.io.DataOutputStream(ends)
    var i = 0
    while (i < values.length) {
      val head = values(i)
      writeVbyte(blob, head.length)
      blob.write(head)
      var prev = head
      var k = 1
      while (k < bucketSize && i + k < values.length) {
        val v = values(i + k)
        val p = commonPrefix(prev, v)
        writeVbyte(blob, p)
        writeVbyte(blob, v.length - p)
        blob.write(v, p, v.length - p)
        prev = v
        k += 1
      }
      endsOut.writeInt(blob.size())
      i += bucketSize
    }
    endsOut.flush()
    val bos = new ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeByte(VERSION)
    out.writeByte(bucketSize)
    out.writeByte(if (hasNull) 1 else 0)
    out.writeInt(values.length)
    out.writeInt(blob.size())
    out.write(ends.toByteArray)
    out.write(blob.toByteArray)
    out.flush()
    bos.toByteArray
  }
}
