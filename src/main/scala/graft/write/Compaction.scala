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
    * buckets each shuffle partition further by time.
    *
    * `clusterBy` range-partitions the rewrite on a column instead of
    * round-robin: each output segment then covers a narrow value slice,
    * so the manifest zone maps prune segments for range/point queries
    * on that column — the OPTIMIZE/CLUSTER BY maintenance shape on
    * segment tables.
    */
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
      case Some(c) =>
        df.repartitionByRange(parts, org.apache.spark.sql.functions.col(c))
      case None => df.repartition(parts)
    }
    val writer = shuffled.write.format("druid").mode("overwrite")
    options.foldLeft(writer) { case (w, (k, v)) => w.option(k, v) }.save(dir)
    Stats(rows, before, DruidTableUtil.discoverSegments(dir).size)
  }
}
