package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.Tables

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Stage the events table as a streaming drop directory. */
  private def stageEvents(): (String, org.apache.spark.sql.DataFrame) = {
    val dir = Files.createTempDirectory("graft-stream-in").toString
    val batch = Tables.events(spark, sf)
      .select(col("ts"), col("event_type"), col("user_id"), col("value"))
    batch.write.mode("overwrite").parquet(dir)
    (dir, batch)
  }

  test("streaming windowed agg matches batch result") {
    val (dir, batch) = stageEvents()
    val schema = spark.read.parquet(dir).schema
    val stream = StreamingOps.windowedAgg(
      StreamingOps.parquetStream(spark, dir, schema), "1 day", "1 hour")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("win_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("win_out")
      .groupBy("event_type").agg(sum("n").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = StreamingOps.windowedAgg(batch, "1 day", "1 hour")
      .groupBy("event_type").agg(sum("n").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // watermark in append mode holds back the final (open) window
    assert(streamed.nonEmpty)
    streamed.foreach { case (k, v) => assert(expected(k) >= v) }
  }

  test("stateful running totals via mapGroupsWithState") {
    import spark.implicits._
    val (dir, batch) = stageEvents()
    val schema = spark.read.parquet(dir).schema
    val ds = StreamingOps.parquetStream(spark, dir, schema)
      .select(col("user_id"), col("event_type"), col("value"))
      .as[StreamingOps.UserEvent]
    val q = StreamingOps.runningUserTotals(ds)
      .writeStream.outputMode("update")
      .format("memory").queryName("state_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("state_out")
      .groupBy("user_id").agg(max("n_events").as("n")).agg(sum("n")).head.getLong(0)
    assert(got == batch.count())
  }

  test("stream-stream join: realistic watermark evicts state, result stays exact") {
    // time-ordered drop dir: range-partition by ts, ascending mtimes so
    // maxFilesPerTrigger=1 replays micro-batches in event-time order
    val dir = Files.createTempDirectory("graft-ss-join").toString
    val batch = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("event_type"), col("user_id"),
              col("value"))
    batch.repartitionByRange(8, col("ts")).sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    files.zipWithIndex.foreach { case (f, i) =>
      f.setLastModified(1700000000000L + i * 60000L)
    }
    val schema = spark.read.parquet(dir).schema
    val q = StreamingOps.clickPurchaseJoin(spark, dir, schema,
        lateness = "25 hours", maxFilesPerTrigger = Some(1))
      .writeStream.outputMode("append")
      .format("memory").queryName("ssjoin_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val progress = q.recentProgress.toSeq
    // the 25 h watermark must actually clean up: join state rows are
    // evicted as the watermark passes them, and peak state stays well
    // under the total click+purchase row count (the 35-day-span corpus
    // would otherwise accumulate everything)
    val removed = progress.flatMap(_.stateOperators.toSeq)
      .map(_.numRowsRemoved).sum
    assert(removed > 0, "watermark never evicted any join state")
    val peak = progress.flatMap(_.stateOperators.toSeq)
      .map(_.numRowsTotal).max
    val joinSideRows = batch
      .filter(col("event_type").isin("click", "purchase")).count()
    assert(peak < joinSideRows,
      s"state never shrank: peak $peak vs $joinSideRows join-side rows")
    // and the emitted pairs are EXACTLY the batch join
    val expected = batch.filter(col("event_type") === "click")
      .select(col("user_id").as("u"), col("ts").as("cts"),
              col("event_id").as("cid"))
      .join(batch.filter(col("event_type") === "purchase")
          .select(col("user_id").as("u"), col("ts").as("pts")),
        Seq("u"))
      .filter(col("pts") >= col("cts") &&
        col("pts") <= col("cts") + expr("INTERVAL 1 HOUR"))
      .count()
    assert(spark.table("ssjoin_out").count() == expected)
  }

  test("append-mode session windows: emitted once, state evicted, cutoff exact") {
    // time-ordered drop dir (ascending mtimes), one file per micro-batch
    val dir = Files.createTempDirectory("graft-sess-append").toString
    val batch = Tables.events(spark, sf)
      .select(col("ts"), col("event_type"), col("user_id"), col("value"))
    batch.repartitionByRange(8, col("ts")).sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    files.zipWithIndex.foreach { case (f, i) =>
      f.setLastModified(1700000000000L + i * 60000L)
    }
    val schema = spark.read.parquet(dir).schema
    val q = StreamingOps.sessionWindowAppend(
        StreamingOps.parquetStream(spark, dir, schema,
          maxFilesPerTrigger = Some(1)),
        gap = "30 minutes", lateness = "25 hours")
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_append_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // batch replay: gaps-and-islands sessions, emitted iff the final
    // watermark (max ts - lateness) passed the session end (last + gap)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"))
    val sessions = batch
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull ||
          col("ts") >= col("prev") + expr("INTERVAL 30 MINUTE"), 1)
          .otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_events"),
           (max(col("ts")) + expr("INTERVAL 30 MINUTE")).as("s_end"))
    val wm = batch.agg(max(col("ts")) - expr("INTERVAL 25 HOUR")).collect()
      .head.getTimestamp(0)
    val expected = sessions.filter(col("s_end") <= lit(wm)).count()
    val emitted = spark.table("sess_append_out").count()
    assert(emitted == expected,
      s"append sessions: emitted $emitted vs batch cutoff $expected")
    // some sessions stayed open (within the lateness horizon) — the
    // bounded-state contract means NOT everything is emitted
    assert(emitted < sessions.count())
    // and emission evicted session state
    val progress = q.recentProgress.toSeq
    val removed = progress.flatMap(_.stateOperators.toSeq)
      .map(_.numRowsRemoved).sum
    assert(removed > 0, "no session state was ever evicted")
  }

  test("TTL'd dedup: watermark evicts state mid-run, result is exact distinct") {
    // time-ordered drop dir (ascending mtimes), one file per micro-batch
    val dir = Files.createTempDirectory("graft-ttl-dedup").toString
    val batch = Tables.events(spark, sf)
      .select(col("ts"), col("event_type"), col("user_id"), col("value"))
    batch.repartitionByRange(8, col("ts")).sortWithinPartitions(col("ts"))
      .write.mode("overwrite").parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    files.zipWithIndex.foreach { case (f, i) =>
      f.setLastModified(1700000000000L + i * 60000L)
    }
    val schema = spark.read.parquet(dir).schema
    val q = StreamingOps.parquetStream(spark, dir, schema,
        maxFilesPerTrigger = Some(1))
      .withColumn("day", date_trunc("day", col("ts")))
      .withWatermark("ts", "2 days")
      .dropDuplicatesWithinWatermark("user_id", "event_type", "day")
      .writeStream.outputMode("append")
      .format("memory").queryName("ttl_dedup_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // exact: emitted rows = batch distinct (user, type, day) keys
    val expected = batch
      .select(col("user_id"), col("event_type"),
              date_trunc("day", col("ts")).as("day"))
      .distinct().count()
    assert(spark.table("ttl_dedup_out").count() == expected)
    // bounded: the 2-day watermark must evict dedup state mid-run —
    // peak state well under the total key count (s4's plain
    // dropDuplicates would hold every key ever seen)
    val progress = q.recentProgress.toSeq
    val removed = progress.flatMap(_.stateOperators.toSeq)
      .map(_.numRowsRemoved).sum
    assert(removed > 0, "watermark never evicted any dedup state")
    val peak = progress.flatMap(_.stateOperators.toSeq)
      .map(_.numRowsTotal).max
    assert(peak < expected,
      s"state never shrank: peak $peak vs $expected distinct keys")
  }

  test("micro-batch segment ingest lands queryable druid segments") {
    val (dir, batch) = stageEvents()
    val schema = spark.read.parquet(dir).schema
    val out = Files.createTempDirectory("graft-stream-seg").toString + "/t"
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    val stream = StreamingOps.parquetStream(spark, dir, schema)
      .select(col("ts").as("__time"), col("event_type"), col("user_id"), col("value"))
    val q = StreamingOps.segmentSink(stream, out, ckpt)
    q.awaitTermination(120000)
    val back = spark.read.format("druid").load(out)
    assert(back.count() == batch.count())
    assert(back.groupBy("event_type").count().count() == 5)
  }

  test("streaming sink writer options: every epoch's segment is nested-encoded") {
    val dir = Files.createTempDirectory("graft-stream-nin").toString
    val batch = Tables.events(spark, sf)
      .select(col("ts"), col("event_type"), col("user_id"), col("value"))
    batch.repartition(3).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val out = Files.createTempDirectory("graft-stream-nested").toString + "/t"
    val ckpt = Files.createTempDirectory("graft-stream-nckpt").toString
    val stream = StreamingOps.parquetStream(spark, dir, schema,
        maxFilesPerTrigger = Some(1)) // several epochs -> several commits
      .select(col("ts").as("__time"), col("event_type"),
        struct(col("user_id").as("uid"), col("value").as("v")).as("props"))
    val q = StreamingOps.segmentSink(stream, out, ckpt,
      options = Map("complexTypes" -> "props:json",
                    "jsonEncoding" -> "nested"))
    q.awaitTermination(120000)
    val segs = graft.sources.druid.DruidTableUtil.discoverSegments(out)
    assert(segs.length > 1, "maxFilesPerTrigger=1 should commit several epochs")
    segs.foreach { sd =>
      val seg = graft.format.DruidSegment.open(sd)
      assert(seg.smoosh.has(graft.format.NestedColumn.internalName(
        "props", graft.format.NestedColumn.StringDictFile)),
        s"epoch segment $sd is not nested-encoded")
    }
    val back = spark.read.format("druid").load(out)
    assert(back.count() == batch.count())
    val s = back.selectExpr(
      "sum(CAST(get_json_object(props, '$.uid') AS BIGINT)) AS su")
      .head.getLong(0)
    assert(s == batch.selectExpr("sum(user_id)").head.getLong(0))
  }
}
