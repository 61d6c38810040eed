package graft.format

import java.nio.ByteBuffer
import java.nio.file.{Files, Path, Paths}

/** Typed access to one column's decoded readers. */
sealed trait ColumnData { def length: Int }
final case class TimeColumnData(longs: CompressedLongs) extends ColumnData {
  def length: Int = longs.length
}
final case class LongColumnData(longs: CompressedLongs,
    nulls: org.roaringbitmap.buffer.ImmutableRoaringBitmap = null) extends ColumnData {
  def length: Int = longs.length
}
final case class DoubleColumnData(doubles: CompressedDoubles,
    nulls: org.roaringbitmap.buffer.ImmutableRoaringBitmap = null) extends ColumnData {
  def length: Int = doubles.length
}
final case class FloatColumnData(floats: CompressedFloats,
    nulls: org.roaringbitmap.buffer.ImmutableRoaringBitmap = null) extends ColumnData {
  def length: Int = floats.length
}
final case class StringColumnData(strings: StringColumn) extends ColumnData {
  def length: Int = strings.length
}
final case class MultiStringColumnData(strings: StringMultiColumn) extends ColumnData {
  def length: Int = strings.length
}
/** Complex (sketch) columns: GenericIndexed of opaque byte blobs. The
  * reference errors on these (src/column/mod.rs:59-61); we surface them
  * as binary so sketch merge aggregators can consume them.
  */
final case class ComplexColumnData(blobs: GenericIndexed) extends ColumnData {
  def length: Int = blobs.numElements
}
/** NestedCommonFormat V5 nested columns (modern Druid "auto" /
  * COMPLEX&lt;json&gt;): field-shredded storage, surfaced as per-row JSON
  * text rebuilt from the field dictionaries (NestedColumn.scala). The
  * reference errors on ALL Complex (src/column/mod.rs:59-61).
  */
final case class NestedColumnData(nested: NestedColumn) extends ColumnData {
  def length: Int = nested.length
}

/** One opened Druid v9 segment directory (reference src/segment/mod.rs:37-109).
  * Open = version check + mmap + index.drd parse + per-column JSON headers.
  * Cheap enough to do once per task on executors; the mmap never loads
  * more than the blocks a scan touches.
  */
final class DruidSegment(val dir: Path) {
  Version.read(Files.readAllBytes(dir.resolve("version.bin")))
  val smoosh: SmooshReader = SmooshReader.open(dir)
  val metadata: SegmentMetadata = {
    val (buf, base, _) = smoosh.slice("index.drd")
    SegmentMetadata.parse(buf, base)
  }

  /** All readable columns, `__time` first (the reference's schema omits
    * `__time` because index.drd's column list excludes it — we include it,
    * matching what Druid itself exposes).
    */
  val columnNames: Seq[String] = {
    val listed = metadata.columns.filterNot(_ == "__time")
    if (smoosh.has("__time")) "__time" +: listed else listed
  }

  /** Parse one column's descriptor; returns (descriptor, buffer, dataBase). */
  def columnHeader(name: String): (ColumnDescriptor, ByteBuffer, Int) = {
    val (buf, base, _) = smoosh.slice(name)
    val (desc, dataBase) = ColumnDescriptor.parse(buf, base)
    (desc, buf, dataBase)
  }

  /** Like columnHeader but also the logical-file end offset (needed to
    * detect optional trailing sections like bitmap indexes).
    */
  def columnSlice(name: String): (ColumnDescriptor, ByteBuffer, Int, Int) = {
    val (buf, base, len) = smoosh.slice(name)
    val (desc, dataBase) = ColumnDescriptor.parse(buf, base)
    (desc, buf, dataBase, base + len)
  }

  /** Open decoded readers for a column. Each call builds fresh readers
    * (they hold a mutable cached block), so callers on different threads
    * get independent state over the same shared mmap.
    */
  def column(name: String): ColumnData = {
    val (desc, buf, dataBase, end) = columnSlice(name)
    if (name == "__time") TimeColumnData(new CompressedLongs(buf, dataBase))
    else desc.valueType match {
      case "STRING" if desc.hasMultipleValues =>
        MultiStringColumnData(new StringMultiColumn(buf, dataBase, end))
      case "STRING" => StringColumnData(new StringColumn(buf, dataBase, end))
      case "LONG" =>
        val c = new CompressedLongs(buf, dataBase)
        LongColumnData(c, NullTrailer.read(buf, dataBase + c.totalByteSize, end))
      case "FLOAT" =>
        val c = new CompressedFloats(buf, dataBase)
        FloatColumnData(c, NullTrailer.read(buf, dataBase + c.totalByteSize, end))
      case "DOUBLE" =>
        val c = new CompressedDoubles(buf, dataBase)
        DoubleColumnData(c, NullTrailer.read(buf, dataBase + c.totalByteSize, end))
      case "COMPLEX" if desc.partTypes.headOption.contains(NestedColumn.PartType) ||
          // sniff: NestedCommonFormat leads with 0x05; blob columns are
          // GenericIndexed (version byte 0x01) — a real-Druid nested
          // column whose descriptor we failed to tag still dispatches
          // here and fails LOUDLY inside NestedColumn, never misreads
          (buf.get(dataBase) & 0xff) == NestedColumn.V5 =>
        NestedColumnData(new NestedColumn(smoosh, name, buf, dataBase, end))
      case "COMPLEX" => ComplexColumnData {
        val gi = new GenericIndexed(buf, dataBase)
        gi
      }
      case other => fail(s"column '$name': unknown valueType $other")
    }
  }

  /** Row count without decoding any data blocks: every ColumnData's
    * length comes from container headers (the reference decodes the
    * whole __time column instead, src/segment/mod.rs:104-109). Works on
    * segments without a __time file too — the first column, whatever
    * its type, knows its length.
    */
  def numRows: Int = column(columnNames.head).length

  /** Parsed `metadata.drd` (rollup / aggregators / granularity) — the
    * file the reference only inspects from its test
    * (tests/wikipedia_segment_test.rs:87-111, src has no parser).
    * None when the file is absent or unparseable (it's advisory).
    */
  lazy val metadataDrd: Option[MetadataDrd] =
    if (!smoosh.has("metadata.drd")) None
    else scala.util.Try(MetadataDrd.parse(smoosh.readFully("metadata.drd"))).toOption
}

/** Segment-level metadata from `metadata.drd` (JSON). `exactInterval`
  * is our writer's extension recording that index.drd's interval equals
  * [min(__time), max(__time)+1] exactly — real Druid aligns intervals
  * to the segment granularity, so foreign segments never set it and
  * min/max pushdown stays off for them.
  */
final case class MetadataDrd(
    rollup: Boolean,
    queryGranularity: String,
    aggregators: Seq[String],
    timestampColumn: String,
    numRows: Option[Long],
    exactInterval: Boolean)

object MetadataDrd {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def parse(bytes: Array[Byte]): MetadataDrd = {
    val node = mapper.readTree(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
    val aggs = Option(node.get("aggregators")).map { a =>
      (0 until a.size()).map { i =>
        val ag = a.get(i)
        val name = Option(ag.get("name")).map(_.asText()).getOrElse("?")
        val tpe = Option(ag.get("type")).map(_.asText()).getOrElse("?")
        s"$name:$tpe"
      }
    }.getOrElse(Nil)
    MetadataDrd(
      rollup = Option(node.get("rollup")).exists(_.asBoolean(false)),
      queryGranularity = Option(node.get("queryGranularity"))
        .map(g => if (g.isObject && g.has("type")) g.get("type").asText() else g.asText())
        .getOrElse("none"),
      aggregators = aggs,
      timestampColumn = Option(node.get("timestampSpec"))
        .flatMap(t => Option(t.get("column")).map(_.asText())).getOrElse("__time"),
      numRows = Option(node.get("numRows")).map(_.asLong()),
      exactInterval = Option(node.get("exactInterval")).exists(_.asBoolean(false)))
  }
}

/** Optional Roaring null-row trailer after a numeric container (our
  * extension; the reference skips numeric null bitmaps entirely,
  * src/column/long.rs:8-10).
  */
object NullTrailer {
  /** Validated, never-throwing parse: anything that is not exactly a
    * one-element GenericIndexed holding a 0x01-typed Roaring bitmap
    * that fits the logical file reads as "no null trailer" (nulls then
    * surface as their 0-slot values — the pre-extension behavior —
    * rather than a corrupted read of a foreign segment's trailer).
    */
  def read(buf: java.nio.ByteBuffer, base: Int, end: Int):
      org.roaringbitmap.buffer.ImmutableRoaringBitmap = {
    if (end <= base + GenericIndexed.HEADER ||
        (buf.get(base) & 0xff) != GenericIndexed.VERSION) return null
    val gi = try new GenericIndexed(buf, base) catch { case _: Exception => return null }
    if (gi.numElements != 1 || base + gi.totalSize > end) return null
    val (s, e) = gi.elementRange(0)
    if (e - s < 5 || e > end) return null
    val len = buf.getInt(s)
    if (len < 1 || len > e - s - 4 || (buf.get(s + 4) & 0xff) != 0x01) return null
    val dup = buf.duplicate()
    dup.position(s + 5).limit(s + 4 + len)
    try new org.roaringbitmap.buffer.ImmutableRoaringBitmap(dup.slice())
    catch { case _: Exception => null }
  }
}

object DruidSegment {
  /** Test hook: per-directory open counts, for asserting scan planning
    * opens each segment exactly once per query (not once per planning
    * callback). Negligible overhead next to the mmap+header parse.
    */
  val openCounts = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  def open(dir: String): DruidSegment = {
    openCounts.merge(dir, 1L, (a, b) => a + b)
    new DruidSegment(Paths.get(dir))
  }

  /** A directory is a segment if it has version.bin + meta.smoosh. */
  def isSegmentDir(dir: Path): Boolean =
    Files.isRegularFile(dir.resolve("version.bin")) &&
      Files.isRegularFile(dir.resolve("meta.smoosh"))
}
