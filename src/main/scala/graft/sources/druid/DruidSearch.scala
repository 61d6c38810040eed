package graft.sources.druid

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.sum

import graft.format.{DruidSegment, GenericIndexed, MultiStringColumnData, StringColumnData}

/** Druid's SearchQuery analog: which values of the given string
  * dimensions match a substring, and in how many rows?
  *
  * The native engine family answers this from the dictionary alone;
  * so do we — per segment, match against the (distinct, sorted)
  * dictionary entries and take each matching value's row count from its
  * Roaring bitmap cardinality. No row data is ever decoded: the work
  * per segment is O(dictionary size), not O(rows), which is what makes
  * a search over a 100 TB table cheap — dictionaries are a few KB per
  * segment regardless of row count. Segments without bitmap indexes
  * fall back to one pass over the compressed id column (ints only,
  * still no string materialization).
  *
  * Distribution: one task per segment (segments are the unit of
  * parallelism everywhere in the connector); per-segment partial counts
  * merge with a tiny (dim, value) aggregation whose input cardinality
  * is bounded by matching dictionary entries, not rows.
  */
object DruidSearch {

  /** Search `columns` of the segment table at `root` for values
    * containing `substring`. Returns (dim, value, cnt) — exact row
    * counts per matching value per dimension. Non-string and missing
    * columns are ignored (Druid's search does the same).
    */
  def search(spark: SparkSession, root: String, columns: Seq[String],
             substring: String, caseSensitive: Boolean = true,
             prefix: Boolean = false): DataFrame = {
    import spark.implicits._
    val segments = DruidTableUtil.discoverSegments(root)
    val needle = if (caseSensitive) substring else substring.toLowerCase
    val cols = columns // stable local for closure capture
    val cs = caseSensitive
    val pfx = prefix
    // matching dictionary ids first; most searches match few
    // one lazy sequential pass: on a front-coded dictionary per-id
    // stringAt would re-decode each bucket's prefix chain (O(n x
    // bucketSize)); the iterator keeps the scan O(dictionary) without
    // pinning every entry on heap
    def dictHits(dict: graft.format.StringDict): Array[(Int, String)] =
      dict.entriesIterator.zipWithIndex.flatMap { case (b, i) =>
        if (b == null) None
        else {
          val v = new String(b, "UTF-8")
          val hay = if (cs) v else v.toLowerCase
          val hit = if (pfx) hay.startsWith(needle) else hay.contains(needle)
          if (hit) Some(i -> v) else None
        }
      }.toArray
    // case-sensitive PREFIX search on a single-value dim: the sorted
    // dictionary makes matches one contiguous range — O(log n) + hits
    // instead of the O(dictionary) scan
    def stringHits(sc: graft.format.StringColumn): Array[(Int, String)] =
      if (pfx && cs) {
        val (lo, hi) = sc.dictIdRangeForPrefix(needle)
        (lo until hi).map(i => i -> sc.dictionary.stringAt(i)).toArray
      } else dictHits(sc.dictionary)
    val perSegment = spark.sparkContext
      .parallelize(segments, math.max(1, segments.size))
      .flatMap { dir =>
        val seg = DruidSegment.open(dir)
        val names = seg.columnNames.toSet
        cols.iterator.filter(names).flatMap { c =>
          seg.column(c) match {
            case StringColumnData(sc) =>
              val hits = stringHits(sc)
              if (hits.isEmpty) Iterator.empty
              else if (sc.bitmaps.isDefined)
                hits.iterator.map { case (i, v) =>
                  (c, v, sc.bitmapFor(i).get.getCardinality.toLong)
                }
              else {
                // ids-only fallback: one pass, count per matching id
                val counts = new Array[Long](sc.dictionary.numElements)
                val wanted = new Array[Boolean](counts.length)
                hits.foreach { case (i, _) => wanted(i) = true }
                var r = 0
                val len = sc.length
                while (r < len) {
                  val id = sc.ids.get(r)
                  if (wanted(id)) counts(id) += 1
                  r += 1
                }
                hits.iterator.map { case (i, v) => (c, v, counts(i)) }
              }
            case MultiStringColumnData(mc) =>
              // multi-value dims: count ROWS containing the value
              // (Druid's search semantics), one pass over the flat ids
              // with a last-row-counted guard against in-row repeats
              val hits = dictHits(mc.dictionary)
              if (hits.isEmpty) Iterator.empty
              else {
                val counts = new Array[Long](mc.dictionary.numElements)
                val wanted = new Array[Boolean](counts.length)
                val lastRow = new Array[Int](counts.length)
                java.util.Arrays.fill(lastRow, -1)
                hits.foreach { case (i, _) => wanted(i) = true }
                var r = 0
                val rows = mc.length
                while (r < rows) {
                  val (s, e) = mc.rowRange(r)
                  var k = s
                  while (k < e) {
                    val id = mc.flatIds.get(k)
                    if (wanted(id) && lastRow(id) != r) {
                      counts(id) += 1; lastRow(id) = r
                    }
                    k += 1
                  }
                  r += 1
                }
                hits.iterator.map { case (i, v) => (c, v, counts(i)) }
              }
            case _ => Iterator.empty // only dictionary dims are searchable
          }
        }
      }
    perSegment.toDF("dim", "value", "cnt")
      .groupBy("dim", "value").agg(sum("cnt").as("cnt"))
  }
}
