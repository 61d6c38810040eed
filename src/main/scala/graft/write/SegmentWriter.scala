package graft.write

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}

import graft.format._

/** Druid v9 segment writer. The reference ships no writer (its test
  * fixture blob is even missing, FIXTURES.md §1) — this generates
  * real v9 segments for fixtures, round-trip tests, and ingest.
  *
  * Layout produced (mirrors what the reference decoders read):
  * version.bin (v9), meta.smoosh + NNNNN.smoosh chunks, index.drd,
  * metadata.drd (JSON), one logical file per column
  * ([jsonLen][descriptor JSON][binary]).
  */
object SegmentWriter {

  sealed trait ColumnValues { def length: Int }
  /** Numeric columns carry an optional null-row set (the reference
    * explicitly skips null bitmaps — src/column/long.rs:8-10; we write
    * and honor them). Null slots hold 0 in the compressed data.
    */
  final case class LongValues(values: Array[Long],
                              nulls: Array[Int] = Array.empty) extends ColumnValues {
    def length: Int = values.length
  }
  /** Non-`__time` timestamp column: stored as a LONG column of epoch
    * MICROS (full Spark precision) with `logicalType` recorded in the
    * descriptor so reads restore TimestampType; a plain Druid reader
    * sees an ordinary LONG column.
    */
  final case class TimestampValues(micros: Array[Long],
                                   nulls: Array[Int] = Array.empty,
                                   ntz: Boolean = false) extends ColumnValues {
    def length: Int = micros.length
  }
  final case class DoubleValues(values: Array[Double],
                                nulls: Array[Int] = Array.empty) extends ColumnValues {
    def length: Int = values.length
  }
  final case class FloatValues(values: Array[Float],
                               nulls: Array[Int] = Array.empty) extends ColumnValues {
    def length: Int = values.length
  }
  final case class StringValues(values: Array[String]) extends ColumnValues {
    def length: Int = values.length
  }
  final case class MultiStringValues(values: Array[Seq[String]]) extends ColumnValues {
    def length: Int = values.length
  }
  final case class ComplexValues(typeName: String, values: Array[Array[Byte]])
      extends ColumnValues {
    def length: Int = values.length
  }
  /** COMPLEX&lt;json&gt; stored as Druid's NestedCommonFormat V5 (field
    * dictionaries + per-field sub-columns in internal smoosh files)
    * instead of opaque blobs — the `jsonEncoding=nested` write option.
    * Values are per-row JSON texts (null = null row).
    */
  final case class NestedJsonValues(values: Array[String]) extends ColumnValues {
    def length: Int = values.length
  }

  /** Write a segment. `time` is epoch millis (the mandatory `__time`);
    * `columns` are (name -> values) in schema order, all the same length.
    * `maxChunkSize` bounds physical chunks (2 GiB - 1 in real Druid); a
    * logical file never spans chunks, matching SmooshedFileMapper.
    */
  def write(dir: Path, time: Array[Long],
            columns: Seq[(String, ColumnValues)],
            compression: Byte = Compression.LZ4,
            maxChunkSize: Int = Int.MaxValue,
            stringBitmaps: Boolean = true,
            frontCodedStrings: Boolean = false,
            rollup: Boolean = false,
            queryGranularity: String = "none",
            conciseBitmaps: Boolean = false): Unit = {
    require(columns.forall(_._2.length == time.length),
      "all columns must have the same row count")
    Files.createDirectories(dir)

    val dims = columns.collect {
      case (n, _: StringValues) => n
      case (n, _: MultiStringValues) => n
    }
    val intervalStart = if (time.isEmpty) 0L else time.min
    val intervalEnd = if (time.isEmpty) 1L else time.max + 1

    val logicalFiles = scala.collection.mutable.LinkedHashMap[String, Array[Byte]]()
    logicalFiles("__time") = ColumnDescriptor.wrapColumn(
      "LONG", "longV2", CompressedColumnar.writeLongs(time, compression))
    columns.foreach { case (name, vals) =>
      vals match {
        case NestedJsonValues(texts) =>
          // nested column = main file + internal "<col>.<part>" smoosh
          // entries (dictionaries, null index, per-field sub-columns);
          // internals never appear in index.drd's column list
          val (main, internals) = NestedColumn.write(name, texts)
          logicalFiles(name) = ColumnDescriptor.wrapColumn(
            "COMPLEX", NestedColumn.PartType, main)
          internals.foreach { case (n, b) => logicalFiles(n) = b }
        case _ =>
          logicalFiles(name) =
            encodeColumn(vals, compression, stringBitmaps, frontCodedStrings,
              conciseBitmaps)
      }
    }
    logicalFiles("index.drd") = SegmentMetadata.write(SegmentMetadata(
      columns.map(_._1), dims, intervalStart, intervalEnd))
    logicalFiles("metadata.drd") =
      metadataDrd(time.length, rollup, queryGranularity)

    // smoosh packing with chunk rollover
    val meta = new StringBuilder()
    var chunk = 0
    var offset = 0
    var out = newChunk(dir, chunk)
    val entryLines = scala.collection.mutable.ArrayBuffer[String]()
    logicalFiles.foreach { case (name, bytes) =>
      if (offset > 0 && offset.toLong + bytes.length > maxChunkSize) {
        out.close(); chunk += 1; offset = 0; out = newChunk(dir, chunk)
      }
      out.write(bytes)
      entryLines += s"$name,$chunk,$offset,${offset + bytes.length}"
      offset += bytes.length
    }
    out.close()

    meta.append(s"v1,${Int.MaxValue},${chunk + 1}\n")
    entryLines.foreach(l => meta.append(l).append('\n'))
    Files.write(dir.resolve("meta.smoosh"), meta.toString.getBytes(UTF_8))
    Files.write(dir.resolve("version.bin"), Version.bytes)
    Files.write(dir.resolve("factory.json"),
      """{"type":"mMapSegmentFactory"}""".getBytes(UTF_8))
  }

  private def newChunk(dir: Path, i: Int) =
    new BufferedOutputStream(
      new FileOutputStream(dir.resolve(f"$i%05d.smoosh").toFile), 1 << 20)

  /** Roaring null-row trailer appended after a numeric container (same
    * one-element GenericIndexed shape as the string bitmap indexes).
    */
  private def nullTrailer(nulls: Array[Int]): Array[Byte] =
    if (nulls.isEmpty) Array.emptyByteArray
    else {
      val bm = new org.roaringbitmap.RoaringBitmap()
      nulls.foreach(bm.add)
      bm.runOptimize()
      val b = new java.io.ByteArrayOutputStream()
      val d = new java.io.DataOutputStream(b)
      d.writeByte(0x01)
      bm.serialize(d)
      d.flush()
      GenericIndexed.writeLengthPrefixed(Seq(b.toByteArray), sorted = false)
    }

  private def encodeColumn(vals: ColumnValues, compression: Byte,
                           stringBitmaps: Boolean,
                           frontCodedStrings: Boolean,
                           conciseBitmaps: Boolean = false): Array[Byte] =
    vals match {
      case LongValues(v, nulls) => ColumnDescriptor.wrapColumn(
        "LONG", "longV2",
        CompressedColumnar.writeLongs(v, compression) ++ nullTrailer(nulls))
      case TimestampValues(v, nulls, ntz) => ColumnDescriptor.wrapColumn(
        "LONG", "longV2",
        CompressedColumnar.writeLongs(v, compression) ++ nullTrailer(nulls),
        logicalType = Some(if (ntz) "timestamp_ntz_micros" else "timestamp_micros"))
      case DoubleValues(v, nulls) => ColumnDescriptor.wrapColumn(
        "DOUBLE", "doubleV2",
        CompressedColumnar.writeDoubles(v, compression) ++ nullTrailer(nulls))
      case FloatValues(v, nulls) => ColumnDescriptor.wrapColumn(
        "FLOAT", "floatV2",
        CompressedColumnar.writeFloats(v, compression) ++ nullTrailer(nulls))
      case StringValues(v) => ColumnDescriptor.wrapColumn(
        "STRING", "stringDictionary",
        StringColumn.write(v.toSeq, withBitmaps = stringBitmaps,
          frontCodedDict = frontCodedStrings,
          conciseBitmaps = conciseBitmaps))
      case MultiStringValues(v) => ColumnDescriptor.wrapColumn(
        "STRING", "stringMultiV1",
        StringMultiColumn.write(v.toSeq, frontCodedDict = frontCodedStrings,
          withBitmaps = stringBitmaps, conciseBitmaps = conciseBitmaps),
        hasMultipleValues = true)
      case ComplexValues(tn, v) => ColumnDescriptor.wrapColumn(
        "COMPLEX", tn, GenericIndexed.writeLengthPrefixed(v.toSeq, sorted = false))
    }

  private def metadataDrd(rows: Int, rollup: Boolean,
                          queryGranularity: String): Array[Byte] =
    (s"""{"container":{},"aggregators":[],"timestampSpec":""" +
      s"""{"column":"__time","format":"millis"},""" +
      s""""queryGranularity":{"type":"$queryGranularity"},"rollup":$rollup,""" +
      // our extension: this writer's interval is exactly
      // [min(__time), max(__time)+1], so time-bound aggregates can be
      // answered from index.drd alone (real Druid aligns intervals to
      // granularity and never sets this)
      s""""exactInterval":true,""" +
      s""""numRows":$rows}""").getBytes(UTF_8)
}
