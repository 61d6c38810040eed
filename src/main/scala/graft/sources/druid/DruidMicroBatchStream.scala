package graft.sources.druid

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.connector.read.InputPartition
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}

/** Offset = the set of segment names already delivered (sorted for a
  * stable json form). Segment tables are append-only under streaming
  * tails — new segments arrive, old ones never change — so set
  * difference IS the batch.
  */
final case class DruidStreamOffset(segments: Seq[String]) extends Offset {
  override def json(): String =
    DruidStreamOffset.mapper.writeValueAsString(segments.sorted.toArray)
}

object DruidStreamOffset {
  private[druid] val mapper = new ObjectMapper()
  def fromJson(s: String): DruidStreamOffset = {
    val node = mapper.readTree(s)
    val b = Seq.newBuilder[String]
    if (node.isArray) {
      val it = node.elements()
      while (it.hasNext) b += it.next().asText()
    }
    DruidStreamOffset(b.result())
  }
}

/** Structured-Streaming source over a segment table: each micro-batch
  * is exactly the segments that appeared since the last offset —
  * tailing an actively-ingesting table (the write side of this very
  * connector, a Druid real-time hand-off, or any append-only segment
  * producer).
  *
  * The scale shape mirrors the batch scan: discovering a batch is one
  * manifest read (no segment opens), each new segment contributes
  * row-range splits, and the pushed time/zone/dim pruning applies per
  * batch — a tailing query with a `__time` window or dimension filter
  * never schedules tasks for segments it would discard.
  *
  * Contract: the table must be APPEND-ONLY while tailed. Compaction or
  * overwrite rewrites segment names, which a set-difference offset
  * would re-deliver; run maintenance on tailed tables only between
  * streams (same rule as Delta/Iceberg streaming reads without a
  * transaction log).
  */
class DruidMicroBatchStream(root: String,
                            admit: SegMeta => Boolean,
                            partitionsFor: Seq[SegMeta] => Array[InputPartition],
                            factory: () => org.apache.spark.sql.connector.read.PartitionReaderFactory)
    extends MicroBatchStream {

  private def names(metas: Seq[SegMeta]): Seq[String] =
    metas.map(m => java.nio.file.Paths.get(m.dir).getFileName.toString)

  override def initialOffset(): Offset = DruidStreamOffset(Nil)

  // ALL current segments enter the offset (pruned ones too) so a
  // later filter change can never re-deliver them
  override def latestOffset(): Offset =
    DruidStreamOffset(names(SegmentCatalog.metaFor(root)))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[DruidStreamOffset].segments.toSet
    val until = end.asInstanceOf[DruidStreamOffset].segments.toSet
    val metas = SegmentCatalog.metaFor(root).filter { m =>
      val n = java.nio.file.Paths.get(m.dir).getFileName.toString
      !seen.contains(n) && until.contains(n)
    }
    partitionsFor(metas.filter(admit))
  }

  override def createReaderFactory(): org.apache.spark.sql.connector.read.PartitionReaderFactory =
    factory()

  override def deserializeOffset(json: String): Offset =
    DruidStreamOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
