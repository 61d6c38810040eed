package graft.format

import java.nio.ByteBuffer

/** `index.drd` (reference src/segment/metadata.rs:9-75):
  * {{{
  * [columns: GenericIndexed<String>]     // ObjectStrategy elements
  * [dimensions: GenericIndexed<String>]
  * [intervalStartMs i64][intervalEndMs i64]
  * [bitmapSerdeFactory: optional, ignored]
  * }}}
  * Name elements use ObjectStrategy in real segments; we use the
  * auto-detecting accessor so either encoding reads correctly
  * (see GenericIndexed.stringAuto).
  */
final case class SegmentMetadata(
    columns: Seq[String],
    dimensions: Seq[String],
    intervalStartMs: Long,
    intervalEndMs: Long)

object SegmentMetadata {
  def parse(buf: ByteBuffer, base: Int): SegmentMetadata = {
    val colsGi = new GenericIndexed(buf, base)
    val columns = (0 until colsGi.numElements).map(colsGi.stringAuto)
    val dimsBase = base + colsGi.totalSize
    val dimsGi = new GenericIndexed(buf, dimsBase)
    val dimensions = (0 until dimsGi.numElements).map(dimsGi.stringAuto)
    val intervalBase = dimsBase + dimsGi.totalSize
    SegmentMetadata(columns, dimensions,
      buf.getLong(intervalBase), buf.getLong(intervalBase + 8))
  }

  def write(meta: SegmentMetadata): Array[Byte] = {
    val cols = GenericIndexed.writeObjectStrings(meta.columns, sorted = false)
    val dims = GenericIndexed.writeObjectStrings(meta.dimensions, sorted = false)
    val out = ByteBuffer.allocate(cols.length + dims.length + 16)
    out.put(cols).put(dims)
      .putLong(meta.intervalStartMs).putLong(meta.intervalEndMs)
    out.array()
  }
}
