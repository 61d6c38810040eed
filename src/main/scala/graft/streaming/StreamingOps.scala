package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured Streaming surface. The reference is strictly bounded
  * (Boundedness::Bounded, reference src/datafusion_ext/execution_plan.rs:44);
  * this is the planned extension (SURVEY.md §2.2 streaming row): the
  * same engine operators over unbounded input, plus micro-batch segment
  * ingest so a stream lands as druid segments our connector reads back.
  */
object StreamingOps {

  /** Tumbling-window counts/sums with a watermark for late data. */
  def windowedAgg(events: DataFrame, windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Per-user session windows in APPEND mode — the sessionization shape
    * that survives an unbounded stream. Complete-mode session_window
    * (s5) re-emits the whole result every micro-batch and keeps every
    * session ever seen in state; with a watermark + append output a
    * session is emitted once, when the watermark passes its end
    * (last event + gap), and its state row is evicted. State is bounded
    * by (lateness + gap) of events per key, not by the stream's
    * history. The trade is the streaming-canonical one: sessions still
    * open within `lateness` of the stream head stay in state, unemitted
    * — the batch replay must apply the same emission cutoff
    * (session_end <= max(ts) - lateness).
    */
  def sessionWindowAppend(events: DataFrame, gap: String,
                          lateness: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
              col("session_window.end").as("session_end"),
              col("user_id"), col("n_events"))

  final case class UserEvent(user_id: Long, event_type: String, value: Double)
  final case class UserAgg(user_id: Long, n_events: Long, total_value: Double)

  /** Custom streaming state: running per-user totals via
    * mapGroupsWithState (KeyValueGroupedDataset custom state surface).
    */
  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserAgg] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserAgg, UserAgg](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[UserEvent], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(user, 0L, 0.0))
          val batch = rows.toSeq
          val next = UserAgg(user, prev.n_events + batch.size,
            prev.total_value + batch.map(_.value).sum)
          state.update(next)
          next
      }
  }

  /** Micro-batch segment ingest through the NATIVE streaming sink
    * (`writeStream.format("druid")`): every epoch's data becomes druid
    * segments under `outDir` (append = new immutable segment dirs,
    * idempotent across epoch replays via per-epoch commit markers), so
    * the stream is queryable through the batch connector as it lands —
    * the Druid real-time-ingest shape on Spark primitives.
    */
  def segmentSink(stream: DataFrame, outDir: String, checkpoint: String,
                  trigger: Trigger = Trigger.AvailableNow(),
                  options: Map[String, String] = Map.empty): StreamingQuery =
    stream.writeStream
      .format("druid")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .options(options) // writer options (complexTypes, jsonEncoding, ...)
      .trigger(trigger)
      .start(outDir)

  /** File-watch stream over a parquet drop directory with an explicit
    * schema (streaming needs one). `maxFilesPerTrigger` bounds each
    * micro-batch; the source replays files oldest-modification first,
    * so a drop dir staged with ascending mtimes streams in that order.
    */
  def parquetStream(spark: SparkSession, dir: String,
                    schema: org.apache.spark.sql.types.StructType,
                    maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n.toString))
    r.parquet(dir)
  }

  /** Stream-stream inner join: clicks joined to purchases of the same
    * user within the following hour, both sides streaming from the same
    * event drop dir. The time-range condition plus the watermark is
    * what bounds join state at scale: a click older than
    * (watermark - 1 hour) can never match a future purchase, so the
    * state store evicts it. `lateness` is the real knob — it should be
    * the expected event lateness (hours), NOT the data span; with a
    * time-ordered drop dir (ascending file mtimes + maxFilesPerTrigger)
    * nothing ever arrives below the watermark, state stays bounded by
    * (lateness + join window) of events, and the emitted pair set is
    * exactly the batch join.
    */
  def clickPurchaseJoin(spark: SparkSession, dir: String,
                        schema: org.apache.spark.sql.types.StructType,
                        lateness: String,
                        maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    def side(tpe: String, pfx: String) =
      parquetStream(spark, dir, schema, maxFilesPerTrigger)
        .filter(col("event_type") === tpe)
        .select(col("user_id").as(s"${pfx}_user"),
                col("ts").as(s"${pfx}_ts"),
                col("event_id").as(s"${pfx}_id"))
        .withWatermark(s"${pfx}_ts", lateness)
    side("click", "c").join(side("purchase", "p"),
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"))
  }
}
