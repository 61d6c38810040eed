package graft.cli

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Druid's `sys` metadata schema over the live broker: sys.segments
  * lists manifests at scan time (liveness across commits, datasource
  * pushdown pruning), sys.servers reports the process, sys.tasks
  * mirrors the statements registry. Real HTTP against a live server,
  * like DruidServeSpec.
  */
class SysSchemaSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  private val mapper = new ObjectMapper()

  private def events(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map(i =>
        (s"2024-01-0${i % 3 + 1} 0$i:00:00", s"type$i", i.toLong, i * 10.0))
      .toDF("t", "event_type", "user_id", "value")
      .select(to_timestamp(col("t")).as("__time"), col("event_type"),
              col("user_id"), col("value"))
  }

  private def sql(port: Int, q: String): (Int, String) = {
    val client = HttpClient.newHttpClient()
    val req = HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port/druid/v2/sql"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(
        mapper.writeValueAsString(
          mapper.createObjectNode().put("query", q))))
      .build()
    val r = client.send(req, HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  test("Druid console queries replay green (segments/datasources/servers/tasks views)") {
    // The exact SQL shapes the Druid web console emits against sys.*
    // (segments-view / datasources-view / services-view / tasks-view):
    // quoted identifiers, reserved "end", FILTER (WHERE ...) rollups,
    // CASE rank sorting. These are the queries a migrating operator's
    // console actually fires — all must answer, and the per-segment
    // flags must carry the single-copy shared-filesystem semantics
    // (active=published=available=1, realtime=overshadowed=0).
    val root = java.nio.file.Files.createTempDirectory("sys_console").toString
    events(3).coalesce(1).write.format("druid").mode("overwrite")
      .save(s"$root/ev")
    val server = DruidServe.start(spark,
      _ => spark.read.format("druid").load(s"$root/ev"), port = 0,
      sqlTables = Map("ev" -> spark.read.format("druid").load(s"$root/ev")),
      ingestRoot = Some(root), sysSchema = true)
    try {
      val port = server.getAddress.getPort

      // segments view (default sort "start" DESC)
      val (c1, b1) = sql(port,
        """SELECT "segment_id", "datasource", "start", "end", "size",
           "version", "partition_num", "num_replicas",
           "replication_factor", "num_rows", "is_active", "is_available",
           "is_published", "is_realtime", "is_overshadowed", "shard_spec",
           "dimensions", "metrics", "last_compaction_state"
           FROM sys.segments
           ORDER BY "start" DESC
           LIMIT 25""")
      assert(c1 == 200, b1)
      val segs = mapper.readTree(b1)
      assert(segs.size() > 0, b1)
      val s0 = segs.get(0)
      assert(s0.path("datasource").asText() == "ev")
      assert(s0.path("is_active").asLong() == 1L)
      assert(s0.path("is_available").asLong() == 1L)
      assert(s0.path("is_realtime").asLong() == 0L)
      assert(s0.path("num_rows").asLong() > 0L)
      assert(s0.path("size").asLong() > 0L)

      // datasources view (FILTER (WHERE ...) rollup over sys.segments)
      val (c2, b2) = sql(port,
        """SELECT
           datasource,
           COUNT(*) FILTER (WHERE is_active = 1) AS num_segments,
           COUNT(*) FILTER (WHERE is_available = 0 AND is_active = 1)
             AS num_segments_to_load,
           SUM("size") FILTER (WHERE is_active = 1) AS total_data_size,
           SUM("size" * "num_replicas") FILTER (WHERE is_active = 1)
             AS replicated_size,
           MIN("num_rows") FILTER (WHERE is_active = 1) AS min_segment_rows,
           AVG("num_rows") FILTER (WHERE is_active = 1) AS avg_segment_rows,
           MAX("num_rows") FILTER (WHERE is_active = 1) AS max_segment_rows,
           SUM("num_rows") FILTER (WHERE is_active = 1) AS total_rows,
           MIN("size") FILTER (WHERE is_active = 1 AND "size" <> 0)
             AS min_segment_size,
           AVG("size") FILTER (WHERE is_active = 1 AND "size" <> 0)
             AS avg_segment_size,
           MAX("size") FILTER (WHERE is_active = 1 AND "size" <> 0)
             AS max_segment_size
           FROM sys.segments
           GROUP BY 1
           ORDER BY 1""")
      assert(c2 == 200, b2)
      val ds = mapper.readTree(b2)
      assert(ds.size() == 1, b2)
      assert(ds.get(0).path("datasource").asText() == "ev")
      assert(ds.get(0).path("num_segments").asLong() >= 1L)
      assert(ds.get(0).path("num_segments_to_load").asLong() == 0L)
      assert(ds.get(0).path("total_rows").asLong() == 3L)
      assert(ds.get(0).path("replicated_size").asLong() ==
        ds.get(0).path("total_data_size").asLong()) // 1 replica

      // services view (fill% arithmetic; max_size 0 guards the broker row)
      val (c3, b3) = sql(port,
        """SELECT
           "server", "server_type", "tier", "host", "plaintext_port",
           "tls_port", "curr_size", "max_size",
           CASE WHEN "max_size" = 0 THEN 0
                ELSE ("curr_size" * 100) / "max_size" END AS "fill"
           FROM sys.servers
           ORDER BY "server_type", "server" """)
      assert(c3 == 200, b3)
      val srv = mapper.readTree(b3)
      assert(srv.size() == 2, b3)
      assert(srv.get(0).path("server_type").asText() == "broker")

      // tasks view (CASE rank; "location" column)
      val (c4, b4) = sql(port,
        """SELECT
           "task_id", "group_id", "type", "datasource", "created_time",
           CASE WHEN "status" = 'RUNNING' THEN "runner_status"
                ELSE "status" END AS "status",
           CASE WHEN "status" = 'RUNNING' THEN
                  (CASE "runner_status" WHEN 'RUNNING' THEN 4
                        WHEN 'PENDING' THEN 3 ELSE 2 END)
                ELSE 1 END AS "rank",
           "location", "duration", "error_msg"
           FROM sys.tasks
           ORDER BY "rank" DESC, "created_time" DESC""")
      assert(c4 == 200, b4) // empty registry: shape must still answer
    } finally server.stop(0)
  }

  test("POST /druid/v2/sql/task (legacy MSQ submit) runs ingest via the statements machinery") {
    val root = java.nio.file.Files.createTempDirectory("sql_task").toString
    events(3).coalesce(1).write.format("druid").mode("overwrite")
      .save(s"$root/ev")
    val server = DruidServe.start(spark,
      _ => spark.read.format("druid").load(s"$root/ev"), port = 0,
      sqlTables = Map("ev" -> spark.read.format("druid").load(s"$root/ev")),
      ingestRoot = Some(root), sysSchema = true)
    try {
      val port = server.getAddress.getPort
      val client = HttpClient.newHttpClient()
      // the console's "Run" payload: INSERT + PARTITIONED BY + MSQ
      // task-tuning context keys
      val payload = mapper.createObjectNode()
      payload.put("query",
        """INSERT INTO ev_copy
           SELECT __time, event_type, user_id, value FROM ev
           PARTITIONED BY DAY""")
      payload.putObject("context")
        .put("maxNumTasks", 2)
        .put("taskAssignment", "max")
        .put("executionMode", "async")
      val sr = client.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$port/druid/v2/sql/task"))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(payload.toString))
        .build(), HttpResponse.BodyHandlers.ofString())
      // real Druid's SqlTaskResource replies 202 ACCEPTED at submit
      assert(sr.statusCode() == 202, s"${sr.statusCode()}: ${sr.body()}")
      val status = mapper.readTree(sr.body())
      val taskId = status.path("taskId").asText()
      assert(taskId.nonEmpty, sr.body())
      assert(status.path("state").asText() == "RUNNING", sr.body())

      // the taskId IS the statement id — poll the statements API
      var state = ""
      var tries = 0
      while (state != "SUCCESS" && state != "FAILED" && tries < 200) {
        val st = client.send(HttpRequest.newBuilder(URI.create(
            s"http://127.0.0.1:$port/druid/v2/sql/statements/$taskId"))
          .GET().build(), HttpResponse.BodyHandlers.ofString())
        state = mapper.readTree(st.body()).path("state").asText()
        if (state != "SUCCESS" && state != "FAILED") Thread.sleep(50)
        tries += 1
      }
      assert(state == "SUCCESS")
      // the ingested datasource answers and sys.tasks carries the task
      val (cq, bq) = sql(port, "SELECT count(*) AS n FROM ev_copy")
      assert(cq == 200 && mapper.readTree(bq).get(0).path("n").asLong() == 3L,
        bq)
      val (ct, bt) = sql(port,
        s"""SELECT "type", "datasource", "location"
            FROM sys.tasks WHERE task_id = '$taskId'""")
      assert(ct == 200, bt)
      val t = mapper.readTree(bt)
      assert(t.size() == 1 &&
        t.get(0).path("type").asText() == "query_controller", bt)
      assert(t.get(0).path("datasource").asText() == "ev_copy", bt)
      assert(t.get(0).path("location").asText().endsWith(s":$port"), bt)

      // GET/other methods answer 405, like a resource-specific endpoint
      val mr = client.send(HttpRequest.newBuilder(URI.create(
          s"http://127.0.0.1:$port/druid/v2/sql/task")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(mr.statusCode() == 405, mr.body())
    } finally server.stop(0)
  }

  test("sys.segments lists live manifests; commits appear without restart") {
    val root = java.nio.file.Files.createTempDirectory("sys_root").toString
    val dir = s"$root/ev"
    events(3).coalesce(1).write.format("druid").mode("overwrite").save(dir)
    val inMem = events(2) // served frame with no segments behind it
    val server = DruidServe.start(spark,
      n => if (n == "ev") spark.read.format("druid").load(dir) else inMem,
      port = 0,
      sqlTables = Map("ev" -> spark.read.format("druid").load(dir),
                      "mem" -> inMem),
      ingestRoot = Some(root), sysSchema = true)
    try {
      val port = server.getAddress.getPort
      val (c1, b1) = sql(port,
        """SELECT datasource, num_rows, size, is_published, is_realtime,
           partition_num, start, "end", dimensions, metrics
           FROM sys.segments ORDER BY segment_id""")
      assert(c1 == 200, b1)
      val rows1 = mapper.readTree(b1)
      assert(rows1.size() == 1, b1) // one segment; mem contributes none
      val r0 = rows1.get(0)
      assert(r0.path("datasource").asText() == "ev")
      assert(r0.path("num_rows").asLong() == 3L)
      assert(r0.path("size").asLong() > 0L)
      assert(r0.path("is_published").asLong() == 1L)
      assert(r0.path("is_realtime").asLong() == 0L)
      assert(r0.path("start").asText().startsWith("2024-01-01T"))
      val dims = mapper.readTree(r0.path("dimensions").asText())
      assert(dims.isArray &&
        dims.elements().hasNext, r0.path("dimensions").asText())
      assert(r0.path("metrics").asText().contains("value"))

      // liveness: an append commit shows up on the NEXT query, no
      // re-registration of anything
      events(2).coalesce(1).write.format("druid").mode("append").save(dir)
      val (c2, b2) = sql(port,
        "SELECT count(*) AS n, sum(num_rows) AS rows FROM sys.segments")
      assert(c2 == 200, b2)
      val agg = mapper.readTree(b2).get(0)
      assert(agg.path("n").asLong() == 2L, b2)
      assert(agg.path("rows").asLong() == 5L, b2)
    } finally server.stop(0)
  }

  test("sys.segments shows tombstoned segments as overshadowed until purge") {
    val root = java.nio.file.Files.createTempDirectory("sys_trash").toString
    val dir = s"$root/ev"
    events(3).repartition(3).write.format("druid").mode("overwrite").save(dir)
    val server = DruidServe.start(spark,
      _ => spark.read.format("druid").load(dir), port = 0,
      sqlTables = Map("ev" -> spark.read.format("druid").load(dir)),
      ingestRoot = Some(root), sysSchema = true)
    try {
      val port = server.getAddress.getPort
      // compaction tombstones the replaced generation (deferred delete)
      graft.write.Compaction.compactIncremental(spark, dir,
        targetRowsPerSegment = 1000)
      val (c1, b1) = sql(port,
        """SELECT is_overshadowed, count(*) AS n, sum(is_active) AS act
           FROM sys.segments GROUP BY 1 ORDER BY 1""")
      assert(c1 == 200, b1)
      val rows = mapper.readTree(b1)
      assert(rows.size() == 2, b1)
      // live generation: 1 merged segment, active
      assert(rows.get(0).path("is_overshadowed").asLong() == 0L &&
        rows.get(0).path("n").asLong() == 1L &&
        rows.get(0).path("act").asLong() == 1L, b1)
      // replaced generation: 3 tombstoned dirs, overshadowed + inactive
      assert(rows.get(1).path("is_overshadowed").asLong() == 1L &&
        rows.get(1).path("n").asLong() == 3L &&
        rows.get(1).path("act").asLong() == 0L, b1)
      // purge reclaims them; the view follows on the next query
      assert(graft.sources.druid.SegmentCatalog
        .purgeTombstoned(dir, graceMs = 0L) == 3)
      val (c2, b2) = sql(port,
        "SELECT count(*) AS n FROM sys.segments WHERE is_overshadowed = 1")
      assert(c2 == 200 && mapper.readTree(b2).get(0).path("n").asLong() == 0L,
        b2)
    } finally server.stop(0)
  }

  test("overshadowed rows report the reader leases holding their reclamation") {
    val root = java.nio.file.Files.createTempDirectory("sys_lease").toString
    val dir = s"$root/ev"
    events(3).repartition(3).write.format("druid").mode("overwrite").save(dir)
    val server = DruidServe.start(spark,
      _ => spark.read.format("druid").load(dir), port = 0,
      sqlTables = Map("ev" -> spark.read.format("druid").load(dir)),
      ingestRoot = Some(root), sysSchema = true)
    try {
      val port = server.getAddress.getPort
      // a read plans (lease lands), then compaction tombstones its
      // generation — sys.segments must show WHY the trash isn't
      // reclaiming: the lease id + expiry on each overshadowed row
      assert(spark.read.format("druid").load(dir).count() == 3)
      val lease = graft.sources.druid.ReadLease
        .live(dir, System.currentTimeMillis())
      assert(lease.nonEmpty, "the scan should have leased the table")
      graft.write.Compaction.compactIncremental(spark, dir,
        targetRowsPerSegment = 1000)
      val (c1, b1) = sql(port,
        """SELECT held_by_leases FROM sys.segments
           WHERE is_overshadowed = 1 LIMIT 1""")
      assert(c1 == 200, b1)
      val holders = mapper.readTree(b1).get(0).path("held_by_leases").asText()
      assert(lease.exists(l => holders.contains(l.id)),
        s"overshadowed row must name its lease holder, got: $holders")
      // live rows carry NULL (the column is a trash-hold diagnostic)
      val (c2, b2) = sql(port,
        """SELECT count(*) AS n FROM sys.segments
           WHERE is_overshadowed = 0 AND held_by_leases IS NOT NULL""")
      assert(c2 == 200 && mapper.readTree(b2).get(0).path("n").asLong() == 0L,
        b2)
    } finally server.stop(0)
  }

  test("sys.segments datasource filter prunes partitions at planning") {
    val root = java.nio.file.Files.createTempDirectory("sys_prune").toString
    events(2).coalesce(1).write.format("druid").mode("overwrite").save(s"$root/a")
    events(3).coalesce(1).write.format("druid").mode("overwrite").save(s"$root/b")
    val server = DruidServe.start(spark,
      n => spark.read.format("druid").load(s"$root/$n"), port = 0,
      sqlTables = Map(
        "a" -> spark.read.format("druid").load(s"$root/a"),
        "b" -> spark.read.format("druid").load(s"$root/b")),
      ingestRoot = Some(root), sysSchema = true)
    try {
      // the sys tables live in the session catalog, so the plan is
      // inspectable locally: the scan description names the pruned set
      val df = spark.sql(
        "SELECT datasource, num_rows FROM sys.segments WHERE datasource = 'b'")
      val scan = df.queryExecution.executedPlan.toString
      assert(scan.contains("datasources=b"), scan)
      val rows = df.collect()
      assert(rows.length == 1 && rows.head.getString(0) == "b" &&
        rows.head.getLong(1) == 3L)
    } finally server.stop(0)
  }

  test("sys.servers reports broker + historical; sys.tasks mirrors statements") {
    val root = java.nio.file.Files.createTempDirectory("sys_srv").toString
    events(3).coalesce(1).write.format("druid").mode("overwrite").save(s"$root/ev")
    val server = DruidServe.start(spark,
      _ => spark.read.format("druid").load(s"$root/ev"), port = 0,
      sqlTables = Map("ev" -> spark.read.format("druid").load(s"$root/ev")),
      ingestRoot = Some(root), sysSchema = true)
    try {
      val port = server.getAddress.getPort
      val (c1, b1) = sql(port,
        """SELECT server, server_type, curr_size, is_leader
           FROM sys.servers ORDER BY server_type""")
      assert(c1 == 200, b1)
      val srv = mapper.readTree(b1)
      assert(srv.size() == 2, b1)
      assert(srv.get(0).path("server_type").asText() == "broker")
      assert(srv.get(0).path("is_leader").asLong() == 1L)
      assert(srv.get(1).path("server_type").asText() == "historical")
      assert(srv.get(1).path("curr_size").asLong() > 0L)
      assert(srv.get(0).path("server").asText().endsWith(s":$port"))

      // a statements-API query becomes a sys.tasks row
      val client = HttpClient.newHttpClient()
      val submit = HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$port/druid/v2/sql/statements"))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(
          """{"query": "SELECT count(*) AS n FROM ev"}"""))
        .build()
      val sr = client.send(submit, HttpResponse.BodyHandlers.ofString())
      assert(sr.statusCode() == 200 || sr.statusCode() == 202, sr.body())
      val qid = mapper.readTree(sr.body()).path("queryId").asText()
      // poll until terminal (bounded)
      var state = ""
      var tries = 0
      while (state != "SUCCESS" && tries < 100) {
        val st = client.send(HttpRequest.newBuilder(URI.create(
            s"http://127.0.0.1:$port/druid/v2/sql/statements/$qid"))
          .GET().build(), HttpResponse.BodyHandlers.ofString())
        state = mapper.readTree(st.body()).path("state").asText()
        if (state != "SUCCESS") Thread.sleep(50)
        tries += 1
      }
      assert(state == "SUCCESS")
      val (c2, b2) = sql(port,
        s"""SELECT task_id, type, status, runner_status
            FROM sys.tasks WHERE task_id = '$qid'""")
      assert(c2 == 200, b2)
      val t = mapper.readTree(b2)
      assert(t.size() == 1, b2)
      assert(t.get(0).path("type").asText() == "query_controller")
      assert(t.get(0).path("status").asText() == "SUCCESS")
      assert(t.get(0).path("runner_status").asText() == "NONE")
    } finally server.stop(0)
  }
}
