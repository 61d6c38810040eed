package graft.write

import org.apache.spark.sql.SparkSession

import graft.sources.druid.DruidTableUtil

/** Segment compaction — the maintenance operator a real-time-ingested
  * table needs: streaming micro-batches land as many small segments
  * (graft.streaming.StreamingOps.segmentSink), and scan parallelism /
  * planning cost degrade as the segment count grows. Compaction reads
  * the table through the connector, re-partitions to a target segment
  * size, and atomically overwrites — the same read-shuffle-rewrite
  * shape Druid's own compaction tasks run, on Spark primitives.
  *
  * Safety: the rewrite rides the DSv2 staged overwrite (tasks write
  * under `.staging-<job>`, commit swaps, THEN old segments delete), and
  * the repartition exchange fully materializes the scan before any
  * write task runs — so a failed compaction leaves the table exactly
  * as it was, and the read never races the swap.
  */
object Compaction {

  /** Result of one compaction run. */
  final case class Stats(rows: Long, segmentsBefore: Int, segmentsAfter: Int)

  /** Compact `dir` so each output segment holds ~`targetRowsPerSegment`
    * rows. Pass writer options (e.g. `compression`, `bitmapIndexes`,
    * `segmentGranularity`) through `options`; note a granularity option
    * buckets each shuffle partition further by time. For a rolled-up
    * table, pass the same `rollup`/`queryGranularity` options: the
    * rewrite then re-collapses rows ACROSS the old segment boundaries
    * (ingest rollup is per-task best-effort) — Druid's
    * compaction-with-rollup.
    *
    * `clusterBy` range-partitions the rewrite on a column (or a
    * comma-separated composite key) instead of round-robin: each
    * output segment then covers a narrow value slice, so the manifest
    * zone maps prune segments for range/point queries on the leading
    * column(s) — the OPTIMIZE/CLUSTER BY maintenance shape on segment
    * tables.
    *
    * CONCURRENCY: full compaction is an overwrite — a segment appended
    * between this method's table read and its commit is replaced by
    * output that never saw it (the same last-writer-wins contract as
    * any overwrite). Under concurrent writers use
    * [[compactIncremental]], which merges only the segments it
    * snapshotted and leaves racing appends untouched.
    */
  private def clusterCols(spec: String) =
    spec.split(",").map(_.trim).filter(_.nonEmpty)
      .map(org.apache.spark.sql.functions.col).toSeq

  def compact(spark: SparkSession, dir: String, targetRowsPerSegment: Long,
              options: Map[String, String] = Map.empty,
              clusterBy: Option[String] = None): Stats = {
    require(targetRowsPerSegment > 0,
      s"targetRowsPerSegment must be positive: $targetRowsPerSegment")
    val before = DruidTableUtil.discoverSegments(dir).size
    val df = spark.read.format("druid").load(dir)
    val rows = df.count() // manifest/metadata-answered: no block decodes
    val parts = math.max(1, math.ceil(rows.toDouble / targetRowsPerSegment).toInt)
    val shuffled = clusterBy match {
      case Some(c) => df.repartitionByRange(parts, clusterCols(c): _*)
      case None => df.repartition(parts)
    }
    val writer = shuffled.write.format("druid").mode("overwrite")
    options.foldLeft(writer) { case (w, (k, v)) => w.option(k, v) }.save(dir)
    Stats(rows, before, DruidTableUtil.discoverSegments(dir).size)
  }

  /** Incremental compaction: merge ONLY segments under
    * `minFillFraction * targetRowsPerSegment` rows and leave every
    * full-sized segment untouched. At 100 TB this is the only shape
    * that works — full `compact` rewrites the entire table to merge a
    * few streaming stragglers, incremental rewrites just the
    * stragglers (Druid's own compaction tasks and lakehouse OPTIMIZE
    * behave the same way).
    *
    * Protocol: the merged replacement segments are written to a hidden
    * scratch dir under the table (invisible to discovery), then
    * swapped in with same-filesystem moves, then the merged-away small
    * segments delete, then the manifest rewrites. A crash before the
    * swap changes nothing; the windows between swap, delete, and
    * manifest refresh are the same ones the batch writer has (the
    * manifest self-heals: staleness falls back to parallel opens).
    */
  def compactIncremental(spark: SparkSession, dir: String,
                         targetRowsPerSegment: Long,
                         options: Map[String, String] = Map.empty,
                         clusterBy: Option[String] = None,
                         minFillFraction: Double = 0.5): Stats = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    require(targetRowsPerSegment > 0,
      s"targetRowsPerSegment must be positive: $targetRowsPerSegment")
    require(minFillFraction > 0 && minFillFraction <= 1,
      s"minFillFraction must be in (0, 1]: $minFillFraction")
    // reap trash whose grace period expired before adding more
    graft.sources.druid.SegmentCatalog.purgeTombstoned(dir)
    val metas = graft.sources.druid.SegmentCatalog.metaFor(dir)
    val threshold = (targetRowsPerSegment * minFillFraction).toLong
    val (small, keep) = metas.partition(_.rows < threshold)
    if (small.size < 2) return Stats(0, metas.size, metas.size)

    val rows = small.map(_.rows.toLong).sum
    val parts = math.max(1, math.ceil(rows.toDouble / targetRowsPerSegment).toInt)
    // read ONLY the undersized segments (each segment dir is a valid
    // single-segment table); allowMissingColumns handles schema
    // evolution between them
    val df = small.map(m => spark.read.format("druid").load(m.dir))
      .reduce(_.unionByName(_, allowMissingColumns = true))
    val shuffled = clusterBy match {
      case Some(c) => df.repartitionByRange(parts, clusterCols(c): _*)
      case None => df.repartition(parts)
    }
    val scratch = Paths.get(dir, s".compact-${java.util.UUID.randomUUID().toString.take(8)}")
    try {
      val writer = shuffled.write.format("druid").mode("overwrite")
      options.foldLeft(writer) { case (w, (k, v)) => w.option(k, v) }
        .save(scratch.toString)
      val merged = graft.sources.druid.SegmentCatalog.metaFor(scratch.toString)
      // preserve the cached union schema across the manifest rewrite
      val schema = graft.sources.druid.SegmentCatalog
        .loadSchema(dir, metas.map(_.dir))
      // pending-swap marker brackets move-in + delete so a concurrent
      // reader sees the pre- or post-merge segment set, never both
      graft.sources.druid.SegmentCatalog.writePending(dir,
        adds = merged.map(m => Paths.get(m.dir).getFileName.toString),
        removes = small.map(m => Paths.get(m.dir).getFileName.toString))
      val moved = merged.map { m =>
        val src = Paths.get(m.dir)
        val dst = Paths.get(dir).resolve(src.getFileName)
        Files.move(src, dst, StandardCopyOption.ATOMIC_MOVE)
        m.copy(dir = dst.toString)
      }
      // merged-away segments are TOMBSTONED (deferred deletion): a read
      // that planned them before this swap still opens them; new
      // listings exclude them; purgeTombstoned reaps them after the
      // grace period. This is the Druid handoff contract — without it,
      // any query outliving one compaction cycle aborts.
      small.foreach(m => graft.sources.druid.SegmentCatalog.tombstone(Paths.get(m.dir)))
      // the manifest rewrite snapshots keep+moved; a delta from an
      // append that raced this compaction is superseded but its
      // segment dir survives and resolves by sidecar (not in `small`,
      // so never deleted here)
      graft.sources.druid.SegmentCatalog.write(
        dir, (keep ++ moved).sortBy(_.dir), schema)
      graft.sources.druid.SegmentCatalog.clearPending(dir)
      Stats(rows, metas.size, keep.size + moved.size)
    } finally deleteRecursively(scratch)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
}
