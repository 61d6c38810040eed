package graft.sources.druid

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL `CALL` surface for the table-maintenance operators — the
  * coordinator verbs Druid runs as tasks, exposed the Spark-native
  * way (Spark 4 `ProcedureCatalog`):
  *
  *   CALL <cat>.system.compact('t' [, target_rows [, cluster_by]])
  *   CALL <cat>.system.compact_full('t' [, target_rows [, cluster_by]])
  *   CALL <cat>.system.retain('t', TIMESTAMP '...')
  *
  * `compact` is the INCREMENTAL form (merge only undersized segments,
  * leave full-size ones untouched — the only shape that works at
  * 100 TB under continuous ingest); `compact_full` rewrites the whole
  * table (opt-in re-layout, e.g. with cluster_by); `retain` drops
  * whole segments whose interval ends at or before the cutoff —
  * metadata-only, no scan. Each returns its stats as the CALL result
  * row, so operational runbooks read outcomes from SQL.
  */
object GraftProcedures {

  val names: Seq[String] = Seq("compact", "compact_full", "retain", "purge_trash")

  def load(root: String, name: String): Option[UnboundProcedure] =
    name.toLowerCase match {
      case "compact" => Some(compactProc(root, full = false))
      case "compact_full" => Some(compactProc(root, full = true))
      case "retain" => Some(retainProc(root))
      case "purge_trash" => Some(purgeTrashProc(root))
      case _ => None
    }

  /** Result-as-scan: CALL surfaces the stats row through a LocalScan. */
  private final class ResultScan(schema: StructType, data: Array[InternalRow])
      extends LocalScan {
    override def readSchema(): StructType = schema
    override def rows(): Array[InternalRow] = data
  }

  private def oneRow(schema: StructType, values: Any*): java.util.Iterator[Scan] =
    java.util.Collections.singletonList[Scan](
      new ResultScan(schema, Array(new GenericInternalRow(values.toArray))))
      .iterator()

  private def tableDir(root: String, table: String): String = {
    val p = Paths.get(root, table)
    require(Files.isDirectory(p) &&
      DruidTableUtil.discoverSegments(p.toString).nonEmpty,
      s"no segment table '$table' under $root")
    p.toString
  }

  private def compactProc(root: String, full: Boolean): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = if (full) "compact_full" else "compact"
      override def description(): String =
        if (full) "rewrite the whole table to target_rows-sized segments"
        else "merge undersized segments toward target_rows; full-size segments untouched"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String =
            if (full) "compact_full" else "compact"
          override def parameters(): Array[ProcedureParameter] = Array(
            ProcedureParameter.in("table", StringType)
              .comment("table directory name under the catalog root").build(),
            ProcedureParameter.in("target_rows", LongType)
              .defaultValue("5000000")
              .comment("desired rows per output segment").build(),
            ProcedureParameter.in("cluster_by", StringType)
              .defaultValue("CAST(NULL AS STRING)")
              .comment("range-partition the rewrite on this column " +
                "(comma-separated composite allowed)").build())
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val table = input.getUTF8String(0).toString
            val target = input.getLong(1)
            val clusterBy =
              if (input.isNullAt(2)) None
              else Some(input.getUTF8String(2).toString)
            val spark = SparkSession.active
            val dir = tableDir(root, table)
            val st =
              if (full)
                graft.write.Compaction.compact(spark, dir, target,
                  clusterBy = clusterBy)
              else
                graft.write.Compaction.compactIncremental(spark, dir, target,
                  clusterBy = clusterBy)
            oneRow(
              StructType(Seq(
                StructField("rows_rewritten", LongType, nullable = false),
                StructField("segments_before", IntegerType, nullable = false),
                StructField("segments_after", IntegerType, nullable = false))),
              st.rows, st.segmentsBefore, st.segmentsAfter)
          }
        }
    }

  /** CALL <cat>.system.purge_trash('t' [, grace_ms]) — physically
    * delete tombstoned segment dirs whose grace period expired
    * (deferred deletion normally rides the next maintenance op; this
    * is the explicit reclaim verb for tables that stopped compacting,
    * Druid's kill task). grace_ms overrides the configured grace for
    * this call only — 0 reclaims everything logically deleted NOW;
    * only safe when no query that planned the old generation can
    * still be running.
    */
  private def purgeTrashProc(root: String): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = "purge_trash"
      override def description(): String =
        "physically delete tombstoned segment dirs past their grace period"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = "purge_trash"
          override def parameters(): Array[ProcedureParameter] = Array(
            ProcedureParameter.in("table", StringType)
              .comment("table directory name under the catalog root").build(),
            ProcedureParameter.in("grace_ms", LongType)
              .defaultValue("CAST(NULL AS BIGINT)")
              .comment("override the configured grace period; 0 = reclaim " +
                "all logically-deleted segments now").build())
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val table = input.getUTF8String(0).toString
            val grace =
              if (input.isNullAt(1)) SegmentCatalog.trashGraceMs
              else input.getLong(1)
            require(grace >= 0, s"grace_ms must be >= 0: $grace")
            // no live-segment requirement: a fully-retained table (all
            // segments tombstoned) is exactly what this verb reclaims
            val p = Paths.get(root, table)
            require(Files.isDirectory(p),
              s"no table directory '$table' under $root")
            val purged = SegmentCatalog.purgeTombstoned(p.toString, grace)
            oneRow(
              StructType(Seq(
                StructField("segments_purged", IntegerType, nullable = false))),
              purged)
          }
        }
    }

  private def retainProc(root: String): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = "retain"
      override def description(): String =
        "drop whole segments whose interval ends at or before the cutoff " +
          "(metadata-only; straddlers are kept, like Druid drop rules)"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = "retain"
          override def parameters(): Array[ProcedureParameter] = Array(
            ProcedureParameter.in("table", StringType)
              .comment("table directory name under the catalog root").build(),
            ProcedureParameter.in("older_than", TimestampType)
              .comment("drop segments ending at or before this instant")
              .build())
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val table = input.getUTF8String(0).toString
            val cutoffMs = Math.floorDiv(input.getLong(1), 1000L) // micros -> ms
            val dir = tableDir(root, table)
            val st = graft.write.Retention.dropOlderThan(dir, cutoffMs)
            oneRow(
              StructType(Seq(
                StructField("segments_dropped", IntegerType, nullable = false),
                StructField("rows_dropped", LongType, nullable = false),
                StructField("segments_kept", IntegerType, nullable = false))),
              st.segmentsDropped, st.rowsDropped, st.segmentsKept)
          }
        }
    }
}
