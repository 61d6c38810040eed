package graft.format

/** Deep integrity check of a segment: every column fully decodes, row
  * counts agree across columns, time values sit inside the declared
  * interval, bitmap indexes cover exactly the rows, null trailers stay
  * in range. Returns human-readable issues (empty = sound). The ops
  * counterpart of the writer: run it after an ingest/compaction/copy
  * before trusting a segment at scale.
  */
object SegmentValidator {

  def validate(dir: String): Seq[String] = validate(dir, expectTimeSorted = false)

  /** As [[validate]]; with `expectTimeSorted` (the manifest's claim for
    * this segment) also verifies `__time` is nondecreasing — a false
    * sorted flag would let the scan report an ordering Spark then
    * trusts to elide sorts.
    */
  def validate(dir: String, expectTimeSorted: Boolean): Seq[String] = {
    val issues = Seq.newBuilder[String]
    val seg =
      try DruidSegment.open(dir)
      catch {
        case e: Exception =>
          return Seq(s"open failed: ${e.getMessage}")
      }
    val rows = try seg.numRows catch {
      case e: Exception => return Seq(s"row count unreadable: ${e.getMessage}")
    }
    val interval = (seg.metadata.intervalStartMs, seg.metadata.intervalEndMs)
    for (name <- seg.columnNames) {
      try {
        seg.column(name) match {
          case TimeColumnData(longs) =>
            if (longs.length != rows)
              issues += s"$name: length ${longs.length} != rows $rows"
            var r = 0
            var prev = Long.MinValue
            while (r < longs.length) {
              val t = longs.get(r)
              if (t < interval._1 || t >= interval._2)
                issues += s"$name: row $r time $t outside interval $interval"
              if (expectTimeSorted && t < prev)
                issues += s"$name: row $r time $t < previous $prev " +
                  "but the manifest claims timeSorted"
              prev = t
              r += 1
            }
          case LongColumnData(vs, nulls) =>
            if (vs.length != rows)
              issues += s"$name: length ${vs.length} != rows $rows"
            var r = 0
            while (r < vs.length) { vs.get(r); r += 1 }
            if (nulls != null && !nulls.isEmpty && nulls.last() >= rows)
              issues += s"$name: null trailer row ${nulls.last()} >= rows $rows"
          case DoubleColumnData(vs, nulls) =>
            if (vs.length != rows)
              issues += s"$name: length ${vs.length} != rows $rows"
            var r = 0
            while (r < vs.length) { vs.get(r); r += 1 }
            if (nulls != null && !nulls.isEmpty && nulls.last() >= rows)
              issues += s"$name: null trailer row ${nulls.last()} >= rows $rows"
          case FloatColumnData(vs, nulls) =>
            if (vs.length != rows)
              issues += s"$name: length ${vs.length} != rows $rows"
            var r = 0
            while (r < vs.length) { vs.get(r); r += 1 }
            if (nulls != null && !nulls.isEmpty && nulls.last() >= rows)
              issues += s"$name: null trailer row ${nulls.last()} >= rows $rows"
          case StringColumnData(sc) =>
            if (sc.length != rows)
              issues += s"$name: length ${sc.length} != rows $rows"
            var r = 0
            while (r < sc.length) { sc.stringAt(r); r += 1 }
            sc.bitmaps.foreach { gi =>
              if (gi.numElements != sc.dictionary.numElements)
                issues += s"$name: ${gi.numElements} bitmaps for " +
                  s"${sc.dictionary.numElements} dictionary entries"
              else {
                val union = new org.roaringbitmap.buffer.MutableRoaringBitmap()
                var id = 0
                while (id < gi.numElements) {
                  sc.bitmapFor(id).foreach(union.or)
                  id += 1
                }
                if (union.getCardinality != rows)
                  issues += s"$name: bitmap union covers " +
                    s"${union.getCardinality} of $rows rows"
                else if (!union.isEmpty && union.last() >= rows)
                  issues += s"$name: bitmap row ${union.last()} >= rows $rows"
              }
            }
          case MultiStringColumnData(mc) =>
            if (mc.length != rows)
              issues += s"$name: length ${mc.length} != rows $rows"
            var r = 0
            while (r < mc.length) { mc.valuesAt(r); r += 1 }
          case ComplexColumnData(blobs) =>
            if (blobs.numElements != rows)
              issues += s"$name: length ${blobs.numElements} != rows $rows"
            var r = 0
            while (r < blobs.numElements) { blobs.bytesAt(r); r += 1 }
          case NestedColumnData(nc) =>
            // full reconstruction pass: exercises the dictionaries,
            // every per-field sub-column, and the null index
            if (nc.length != rows)
              issues += s"$name: length ${nc.length} != rows $rows"
            var r = 0
            while (r < rows) { nc.jsonAt(r); r += 1 }
        }
      } catch {
        case e: Exception =>
          issues += s"$name: decode failed: ${e.getClass.getSimpleName}: ${e.getMessage}"
      }
    }
    issues.result()
  }

  /** Validate every segment of a table, plus manifest row counts when
    * a manifest is present. Returns (segmentDir -> issues).
    */
  def validateTable(root: String): Seq[(String, Seq[String])] = {
    val dirs = graft.sources.druid.DruidTableUtil.discoverSegments(root)
    val sortedClaims: Map[String, Boolean] = graft.sources.druid.SegmentCatalog
      .load(root, dirs).map(_.map(m => m.dir -> m.timeSorted).toMap)
      .getOrElse(Map.empty)
    val perSeg = dirs.map(d =>
      d -> validate(d, sortedClaims.getOrElse(d, false)))
    val manifestIssues = graft.sources.druid.SegmentCatalog
      .load(root, dirs).toSeq.flatMap { metas =>
        metas.flatMap { m =>
          val actual = try DruidSegment.open(m.dir).numRows catch {
            case _: Exception => -1
          }
          if (actual != m.rows)
            Seq(m.dir -> Seq(s"manifest rows ${m.rows} != actual $actual"))
          else Nil
        }
      }
    perSeg ++ manifestIssues
  }
}
