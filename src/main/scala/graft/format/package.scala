package graft

/** Druid v9 segment binary format layer.
  *
  * From-scratch Scala implementation of the on-disk structures the
  * reference decodes (see /root/reference/src/column and src/segment;
  * SURVEY.md §1.2-1.3). Everything is big-endian
  * (reference uses byteorder::BigEndian throughout) — `ByteBuffer`'s
  * default order, so readers use absolute `ByteBuffer` gets over the
  * mmap with zero copies until block decode.
  *
  * Design difference vs the reference (deliberate, for 100 TB scale):
  * the reference materializes entire columns per query
  * (`decompress_all`, reference src/column/compressed_longs.rs:87-115);
  * our readers are block-granular with a single cached decoded block,
  * so a scan streams column data and a segment can be split into
  * row-range partitions at compressed-block boundaries.
  */
package object format {
  final class DruidFormatException(msg: String) extends RuntimeException(msg)

  private[format] def fail(msg: String): Nothing =
    throw new DruidFormatException(msg)
}
