package graft.write

import java.nio.file.Paths

import graft.sources.druid.SegmentCatalog

/** Interval retention — the other maintenance operator a 100 TB
  * time-series table needs: segments whose interval ends at or before
  * the cutoff are deleted whole (no rewrite, no scan; dropping data by
  * time is a metadata operation when the layout is time-partitioned —
  * exactly why Druid buckets segments by interval). Segments that
  * STRADDLE the cutoff are kept in full, matching Druid drop rules,
  * which act on whole segments.
  *
  * Crash windows match the writer's: each segment dir deletes
  * independently; the manifest refresh runs last and self-heals if a
  * crash leaves it stale (staleness falls back to parallel opens).
  */
object Retention {

  final case class Stats(segmentsDropped: Int, rowsDropped: Long,
                         segmentsKept: Int)

  /** Drop every segment with `endMs <= cutoffMs`; returns counts. */
  def dropOlderThan(dir: String, cutoffMs: Long): Stats =
    dropContained(dir, Long.MinValue, cutoffMs)

  /** Drop every segment whose interval is CONTAINED in `[loMs, hiMs)`;
    * straddlers are kept whole (Druid drop rules act on segments).
    * Also the engine of SQL `DELETE FROM t WHERE <__time range>`, which
    * pre-checks via canDeleteWhere that no straddler exists so the
    * delete is row-exact.
    */
  def dropContained(dir: String, loMs: Long, hiMs: Long): Stats =
    dropWhere(dir, m => m.startMs >= loMs && m.endMs <= hiMs)

  /** Drop every segment matching `pred` (whole segments, like Druid
    * drop rules); the engine behind coordinator retention rules, where
    * per-segment keep/drop comes from first-matching-rule evaluation
    * rather than one contiguous interval.
    */
  def dropWhere(dir: String, pred: graft.sources.druid.SegMeta => Boolean)
      : Stats = {
    val metas = SegmentCatalog.metaFor(dir)
    val (drop, keep) = metas.partition(pred)
    // a no-op retention probe stays read-only: the trash purge (the
    // "maintenance rides commits" scheduler) runs only when this call
    // actually mutates the table — a rule matching nothing must not
    // physically reap other generations' trash as a side effect
    if (drop.isEmpty) return Stats(0, 0L, keep.size)
    SegmentCatalog.purgeTombstoned(dir)
    // schema cache read BEFORE anything deletes (manifest covers the
    // current segment set only while it is the current set)
    val schema = SegmentCatalog.loadSchema(dir, metas.map(_.dir))
    // logical delete now (invisible to new listings), physical delete
    // after the grace period — an in-flight scan planned against the
    // pre-drop generation still completes
    drop.foreach(m => SegmentCatalog.tombstone(Paths.get(m.dir)))
    try SegmentCatalog.write(dir, keep.sortBy(_.dir), schema)
    catch { case _: Exception => () } // cache only; never fail the drop
    Stats(drop.size, drop.map(_.rows.toLong).sum, keep.size)
  }
}
