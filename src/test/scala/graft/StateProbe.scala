package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev-only probe: peak streaming STATE-STORE size for the stateful
  * streaming queries at a given SF (the round-6 verdict's sf1
  * question: is state watermark-bounded, or does it grow with the
  * corpus?). Attaches a listener, runs the named SparkEntry streaming
  * queries, prints per-query peak state rows / bytes across every
  * micro-batch.
  */
object StateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var peakRows = 0L
    @volatile var peakBytes = 0L
    @volatile var batches = 0
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        batches += 1
        val ops = e.progress.stateOperators
        if (ops.nonEmpty) {
          val rows = ops.map(_.numRowsTotal).sum
          val bytes = ops.map(_.memoryUsedBytes).sum
          if (rows > peakRows) peakRows = rows
          if (bytes > peakBytes) peakBytes = bytes
        }
      }
    })

    // s13/s15 added for r12: their whole design claim is that per-group
    // state is ONE bounded sketch blob (freq maxMapSize / tuple
    // nominalEntries), so peak state must scale with group count ×
    // blob size and stay FLAT in corpus size — compare sf0.1 vs sf1
    val probes = Seq("s6_stream_stream_join", "s9_stream_dedup_ttl",
      "s11_stream_sessions_append", "s5_stream_sessions",
      "s13_stream_heavy_hitters", "s15_stream_tuple_sketch")
    probes.foreach { name =>
      peakRows = 0; peakBytes = 0; batches = 0
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $name rows=$n batches=$batches " +
        f"peakStateRows=$peakRows peakStateKB=${peakBytes / 1024} " +
        f"wall=$sec%.1fs")
    }
    spark.stop()
  }
}
