package graft.streaming

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.scalatest.funsuite.AnyFunSuite

/** Pins the MICRO-BATCH BUDGET of the streaming queries whose wall time
  * is dominated by batch count, not plan cost (the bench's top
  * entries: the maxFilesPerTrigger=1 ordered-replay family plus the
  * single-batch window query). The counts are the design: 4 range
  * files replayed one per trigger, plus at most two bookkeeping
  * batches (watermark commit / AvailableNow no-data batch). A future
  * change that silently doubles epochs — smaller trigger caps, extra
  * staging files, a re-partitioned drop dir — fails here instead of
  * showing up as an unexplained 2x in BENCH_r{N}.
  */
class StreamingBatchBudgetSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Run one StreamingQueries entry and return how many micro-batches
    * its streaming queries executed. Listener events are delivered
    * asynchronously but in order per query, so once the terminated
    * event for a query arrives every progress event before it has
    * been counted.
    */
  private def batches(name: String): Int = {
    val progress = new ConcurrentHashMap[UUID, AtomicInteger]()
    val started = ConcurrentHashMap.newKeySet[UUID]()
    val terminated = ConcurrentHashMap.newKeySet[UUID]()
    val l = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        started.add(e.id)
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        progress.computeIfAbsent(e.progress.id, _ => new AtomicInteger)
          .incrementAndGet()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        terminated.add(e.id)
    }
    spark.streams.addListener(l)
    try {
      val q = graft.queries.StreamingQueries.all.find(_.name == name)
        .getOrElse(fail(s"no streaming query named $name"))
      q.build(spark, sf).collect()
      val deadline = System.currentTimeMillis() + 60000
      while (!started.asScala.forall(terminated.contains) &&
             System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(started.asScala.forall(terminated.contains),
        s"$name: did not observe query termination within 60s")
      assert(!started.isEmpty, s"$name: no streaming query observed")
      started.asScala.toSeq
        .map(id => Option(progress.get(id)).fold(0)(_.get())).sum
    } finally spark.streams.removeListener(l)
  }

  private def pin(name: String, budget: Int): Unit = {
    val n = batches(name)
    assert(n <= budget,
      s"$name ran $n micro-batches, over its pinned budget of $budget — " +
        "did a change double the epoch count?")
    assert(n > 0, s"$name reported zero micro-batches")
  }

  test("s1_stream_window: unthrottled AvailableNow drains in ~one batch") {
    pin("s1_stream_window", budget = 2)
  }

  test("s5_stream_sessions: 4 ordered files, one per trigger") {
    pin("s5_stream_sessions", budget = 6)
  }

  test("s6_stream_stream_join: 4 ordered files per side, one per trigger") {
    pin("s6_stream_stream_join", budget = 6)
  }

  test("s9_stream_dedup_ttl: 4 ordered files, one per trigger") {
    pin("s9_stream_dedup_ttl", budget = 6)
  }

  test("s11_stream_sessions_append: 4 ordered files, one per trigger") {
    pin("s11_stream_sessions_append", budget = 6)
  }
}
