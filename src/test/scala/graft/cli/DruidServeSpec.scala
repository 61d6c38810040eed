package graft.cli

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The serve endpoint speaks Druid's wire protocol end to end: real
  * HTTP POSTs of native-query JSON (the dr45/dr49 shapes — sketch
  * aggregators and tz-aware period granularity) against a live server,
  * responses parsed as Druid response envelopes.
  */
class DruidServeSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  private val mapper = new ObjectMapper()

  private lazy val events: DataFrame = {
    import spark.implicits._
    Seq(
      ("2024-01-01 01:00:00", "click", 1L, 10.0),
      ("2024-01-01 22:00:00", "view", 2L, 20.0),
      ("2024-01-02 01:00:00", "click", 3L, 30.0),
      ("2024-01-02 12:00:00", "click", 1L, 40.0),
      ("2024-01-03 01:00:00", "view", 2L, 50.0))
      .toDF("t", "event_type", "user_id", "value")
      .select(to_timestamp(col("t")).as("__time"), col("event_type"),
              col("user_id"), col("value"))
  }

  private def withServer[A](body: Int => A): A = withCappedServer(100000)(body)

  private def withCappedServer[A](maxRows: Int)(body: Int => A): A = {
    val server = DruidServe.start(spark, _ => events, port = 0,
      sqlTables = Map("events" -> events), maxResultRows = maxRows)
    try body(server.getAddress.getPort) finally server.stop(0)
  }

  private def sendTo(port: Int, method: String, path: String,
                     json: String = ""): (Int, String) = {
    val client = HttpClient.newHttpClient()
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .header("Content-Type", "application/json")
    val req = method match {
      case "GET"    => b.GET()
      case "DELETE" => b.DELETE()
      case m => b.method(m, HttpRequest.BodyPublishers.ofString(json))
    }
    val resp = client.send(req.build(), HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def postTo(port: Int, path: String, json: String): (Int, String) =
    sendTo(port, "POST", path, json)

  private def post(port: Int, json: String): (Int, String) =
    postTo(port, "/druid/v2", json)

  test("POST /druid/v2: groupBy with sketch aggregators (the dr45 shape)") {
    withServer { port =>
      val (code, body) = post(port, """{
        "queryType": "groupBy", "dataSource": "events",
        "granularity": "all",
        "dimensions": ["event_type"],
        "aggregations": [
          {"type": "count", "name": "n"},
          {"type": "thetaSketch", "name": "users", "fieldName": "user_id"},
          {"type": "doubleSum", "name": "total_value", "fieldName": "value"}]
      }""")
      assert(code == 200, body)
      val arr = mapper.readTree(body)
      assert(arr.isArray && arr.size == 2)
      val first = arr.get(0)
      assert(first.path("version").asText() == "v1")
      val ev = first.path("event")
      assert(ev.path("event_type").asText() == "click")
      assert(ev.path("n").asLong() == 3L)
      assert(ev.path("users").asDouble() == 2.0) // theta estimate {1,3}
      assert(ev.path("total_value").asDouble() == 80.0)
      assert(arr.get(1).path("event").path("users").asDouble() == 1.0)
    }
  }

  test("POST /druid/v2: timeseries with tz period granularity (the dr49 shape)") {
    withServer { port =>
      val (code, body) = post(port, """{
        "queryType": "timeseries", "dataSource": "events",
        "granularity": {"type": "period", "period": "P1D",
                        "timeZone": "America/Los_Angeles"},
        "context": {"skipEmptyBuckets": true},
        "aggregations": [
          {"type": "count", "name": "n"},
          {"type": "doubleSum", "name": "total_value", "fieldName": "value"}]
      }""")
      assert(code == 200, body)
      val arr = mapper.readTree(body)
      // LA local days (UTC-8): Dec31 {01:00Z Jan1}, Jan1 {22:00Z Jan1,
      // 01:00Z Jan2}, Jan2 {12:00Z Jan2, 01:00Z Jan3}
      assert(arr.size == 3)
      assert(arr.get(0).path("timestamp").asText() == "2023-12-31T08:00:00.000Z")
      assert(arr.get(0).path("result").path("n").asLong() == 1L)
      assert(arr.get(1).path("timestamp").asText() == "2024-01-01T08:00:00.000Z")
      assert(arr.get(1).path("result").path("n").asLong() == 2L)
      assert(arr.get(1).path("result").path("total_value").asDouble() == 50.0)
      assert(arr.get(2).path("timestamp").asText() == "2024-01-02T08:00:00.000Z")
      assert(arr.get(2).path("result").path("n").asLong() == 2L)
      assert(arr.get(2).path("result").path("total_value").asDouble() == 90.0)
    }
  }

  test("POST /druid/v2/sql: Druid SQL with compat aggregators") {
    withServer { port =>
      val sql = "SELECT event_type, COUNT(*) AS n, LATEST(value) AS " +
        "last_value FROM events GROUP BY event_type ORDER BY event_type"
      val (code, body) =
        postTo(port, "/druid/v2/sql", s"""{"query": "$sql"}""")
      assert(code == 200, body)
      val arr = mapper.readTree(body)
      assert(arr.size == 2)
      assert(arr.get(0).path("event_type").asText() == "click")
      assert(arr.get(0).path("n").asLong() == 3L)
      assert(arr.get(0).path("last_value").asDouble() == 40.0)
      assert(arr.get(1).path("event_type").asText() == "view")
      assert(arr.get(1).path("last_value").asDouble() == 50.0)
    }
  }

  test("POST /druid/v2: scan answers the ScanResultValue envelope") {
    withServer { port =>
      val (code, body) = post(port, """{
        "queryType": "scan", "dataSource": "events",
        "columns": ["event_type", "value"],
        "resultFormat": "compactedList", "limit": 3}""")
      assert(code == 200, body)
      val batch = mapper.readTree(body).get(0)
      assert(batch.path("segmentId").isNull)
      assert(batch.path("columns").get(0).asText() == "event_type")
      val ev = batch.path("events")
      assert(ev.size == 3 && ev.get(0).isArray)
      assert(ev.get(0).get(0).asText() == "click" &&
        ev.get(0).get(1).asDouble() == 10.0)
      // default resultFormat "list": events are objects
      val (_, listBody) = post(port, """{
        "queryType": "scan", "dataSource": "events",
        "columns": ["event_type"], "limit": 1}""")
      val le = mapper.readTree(listBody).get(0).path("events").get(0)
      assert(le.isObject && le.path("event_type").asText() == "click")
      // batchSize chunks the result into multiple ScanResultValue
      // batches, each carrying its own columns header (5 rows / 2)
      val (_, batched) = post(port, """{
        "queryType": "scan", "dataSource": "events",
        "columns": ["event_type"], "batchSize": 2}""")
      val batches = mapper.readTree(batched)
      assert(batches.size == 3)
      assert(batches.get(0).path("events").size == 2)
      assert(batches.get(2).path("events").size == 1)
      assert(batches.get(2).path("columns").get(0).asText() == "event_type")
    }
  }

  test("POST /druid/v2: topN with granularity answers one entry per bucket") {
    withServer { port =>
      val (code, body) = post(port, """{
        "queryType": "topN", "dataSource": "events",
        "granularity": "day", "dimension": "event_type",
        "threshold": 1, "metric": "n",
        "aggregations": [{"type": "count", "name": "n"}]
      }""")
      assert(code == 200, body)
      val arr = mapper.readTree(body)
      // fixture spans Jan 1-3: one ranked entry per day
      assert(arr.size == 3)
      assert(arr.get(0).path("timestamp").asText() == "2024-01-01T00:00:00.000Z")
      assert(arr.get(0).path("result").size == 1)
      assert(arr.get(0).path("result").get(0).path("event_type").asText() == "click")
      assert(arr.get(1).path("result").get(0).path("event_type").asText() == "click")
      assert(arr.get(2).path("result").get(0).path("event_type").asText() == "view")
    }
  }

  test("POST /druid/v2/sql: resultFormat array / objectLines / csv, header row") {
    withServer { port =>
      val sql = "SELECT event_type, COUNT(*) AS n FROM events " +
        "GROUP BY event_type ORDER BY event_type"
      // array: positional values, header row first when asked
      val (ac, abody) = postTo(port, "/druid/v2/sql",
        s"""{"query": "$sql", "resultFormat": "array", "header": true}""")
      assert(ac == 200, abody)
      val arr = mapper.readTree(abody)
      assert(arr.get(0).get(0).asText() == "event_type" &&
        arr.get(0).get(1).asText() == "n", "header row lists column names")
      assert(arr.get(1).get(0).asText() == "click" && arr.get(1).get(1).asLong() == 3L)
      assert(arr.get(2).get(0).asText() == "view" && arr.get(2).get(1).asLong() == 2L)
      // objectLines: one JSON object per line, blank-line terminated
      val (lc, lbody) = postTo(port, "/druid/v2/sql",
        s"""{"query": "$sql", "resultFormat": "objectLines"}""")
      assert(lc == 200, lbody)
      val lines = lbody.split("\n", -1)
      assert(mapper.readTree(lines(0)).path("event_type").asText() == "click")
      assert(mapper.readTree(lines(1)).path("n").asLong() == 2L)
      assert(lines.takeRight(2).forall(_.isEmpty), "blank-line terminator")
      // csv with header
      val (cc, cbody) = postTo(port, "/druid/v2/sql",
        s"""{"query": "$sql", "resultFormat": "csv", "header": true}""")
      assert(cc == 200, cbody)
      val csv = cbody.split("\n", -1)
      assert(csv(0) == "event_type,n" && csv(1) == "click,3" && csv(2) == "view,2")
      // unknown format is a loud 400, not a silent default
      val (uc, _) = postTo(port, "/druid/v2/sql",
        s"""{"query": "$sql", "resultFormat": "protobuf"}""")
      assert(uc == 400)
    }
  }

  test("INFORMATION_SCHEMA answers the BI-tool connect queries") {
    withServer { port =>
      val (tc, tbody) = postTo(port, "/druid/v2/sql", """{"query":
        "SELECT TABLE_NAME, TABLE_TYPE FROM INFORMATION_SCHEMA.TABLES WHERE TABLE_SCHEMA = 'druid' ORDER BY TABLE_NAME"}""")
      assert(tc == 200, tbody)
      val tables = mapper.readTree(tbody)
      assert(tables.size == 1 &&
        tables.get(0).path("TABLE_NAME").asText() == "events" &&
        tables.get(0).path("TABLE_TYPE").asText() == "TABLE")
      val (cc, cbody) = postTo(port, "/druid/v2/sql", """{"query":
        "SELECT COLUMN_NAME, DATA_TYPE, ORDINAL_POSITION FROM INFORMATION_SCHEMA.COLUMNS WHERE TABLE_NAME = 'events' ORDER BY ORDINAL_POSITION"}""")
      assert(cc == 200, cbody)
      val cols = mapper.readTree(cbody)
      assert(cols.size == 4)
      assert(cols.get(0).path("COLUMN_NAME").asText() == "__time" &&
        cols.get(0).path("DATA_TYPE").asText() == "TIMESTAMP")
      assert(cols.get(1).path("COLUMN_NAME").asText() == "event_type" &&
        cols.get(1).path("DATA_TYPE").asText() == "VARCHAR")
    }
  }

  test("GET /druid/v2/datasources lists tables and splits dims/metrics") {
    withServer { port =>
      val (lc, lbody) = sendTo(port, "GET", "/druid/v2/datasources")
      assert(lc == 200 && mapper.readTree(lbody).get(0).asText() == "events")
      val (sc, sbody) = sendTo(port, "GET", "/druid/v2/datasources/events")
      assert(sc == 200, sbody)
      val o = mapper.readTree(sbody)
      assert(o.path("dimensions").get(0).asText() == "event_type")
      val mets = (0 until o.path("metrics").size)
        .map(o.path("metrics").get(_).asText()).toSet
      assert(mets == Set("user_id", "value"))
      // the /dimensions and /metrics sub-paths answer bare arrays
      val (dc, dbody) = sendTo(port, "GET", "/druid/v2/datasources/events/dimensions")
      assert(dc == 200 && mapper.readTree(dbody).isArray &&
        mapper.readTree(dbody).get(0).asText() == "event_type")
      val (mc, mbody) = sendTo(port, "GET", "/druid/v2/datasources/events/metrics")
      assert(mc == 200 && mapper.readTree(mbody).isArray)
      val (bc, _) = sendTo(port, "GET", "/druid/v2/datasources/events/bogus")
      assert(bc == 400)
    }
  }

  test("POST /druid/v2/sql: positional parameters bind as typed literals") {
    withServer { port =>
      // the '?' inside the string literal must NOT be substituted
      val (code, body) = postTo(port, "/druid/v2/sql", """{
        "query": "SELECT concat(event_type, '?') AS et, COUNT(*) AS n FROM events WHERE value > ? AND event_type = ? GROUP BY 1",
        "parameters": [{"type": "DOUBLE", "value": 15},
                       {"type": "VARCHAR", "value": "click"}]}""")
      assert(code == 200, body)
      val arr = mapper.readTree(body)
      assert(arr.size == 1)
      assert(arr.get(0).path("et").asText() == "click?")
      assert(arr.get(0).path("n").asLong() == 2L) // values 30 and 40
      // extra placeholders fail loudly
      val (bad, _) = postTo(port, "/druid/v2/sql",
        """{"query": "SELECT ? FROM events", "parameters": []}""")
      assert(bad == 400)
      // backslash-laden values bind exactly (native parameterized SQL,
      // not textual substitution — no escaping bugs possible)
      val (ec, ebody) = postTo(port, "/druid/v2/sql", """{
        "query": "SELECT ? AS v",
        "parameters": [{"type": "VARCHAR", "value": "C:\\tmp\\' AND 1=1"}]}""")
      assert(ec == 200, ebody)
      assert(mapper.readTree(ebody).get(0).path("v").asText() == "C:\\tmp\\' AND 1=1")
      // unparseable typed values are a loud 400, never a silent zero
      val (nc, _) = postTo(port, "/druid/v2/sql", """{
        "query": "SELECT count(*) AS n FROM events WHERE user_id = ?",
        "parameters": [{"type": "BIGINT", "value": "abc"}]}""")
      assert(nc == 400)
    }
  }

  test("POST /druid/v2/sql: typesHeader and sqlTypesHeader rows") {
    withServer { port =>
      val q = "SELECT event_type, user_id, value FROM events LIMIT 1"
      val (ac, abody) = postTo(port, "/druid/v2/sql", s"""{"query": "$q",
        "resultFormat": "array", "header": true,
        "typesHeader": true, "sqlTypesHeader": true}""")
      assert(ac == 200, abody)
      val arr = mapper.readTree(abody)
      assert(arr.get(0).get(0).asText() == "event_type")
      assert(arr.get(1).get(0).asText() == "STRING" &&
        arr.get(1).get(1).asText() == "LONG")
      assert(arr.get(2).get(0).asText() == "VARCHAR" &&
        arr.get(2).get(1).asText() == "BIGINT")
      assert(arr.size == 4) // names + 2 type rows + 1 data row
      // csv: type rows follow the name row
      val (cc, cbody) = postTo(port, "/druid/v2/sql", s"""{"query": "$q",
        "resultFormat": "csv", "header": true, "typesHeader": true}""")
      assert(cc == 200)
      val lines = cbody.split("\n", -1)
      assert(lines(0) == "event_type,user_id,value")
      assert(lines(1) == "STRING,LONG,DOUBLE")
      // object header carries type objects when asked
      val (oc, obody) = postTo(port, "/druid/v2/sql", s"""{"query": "$q",
        "resultFormat": "object", "header": true, "sqlTypesHeader": true}""")
      assert(oc == 200)
      assert(mapper.readTree(obody).get(0).path("value")
        .path("sqlType").asText() == "DOUBLE")
    }
  }

  test("results past maxResultRows answer Druid's ResourceLimitExceeded envelope") {
    withCappedServer(maxRows = 3) { port =>
      // unlimited scan over 5 rows trips the cap
      val (code, body) = post(port, """{
        "queryType": "scan", "dataSource": "events",
        "columns": ["event_type", "value"]}""")
      assert(code == 400, body)
      val err = mapper.readTree(body)
      assert(err.path("error").asText() == "Resource limit exceeded")
      assert(err.path("errorMessage").asText().contains("3 rows"))
      // a scan WITH a limit under the cap still answers
      val (ok, okBody) = post(port, """{
        "queryType": "scan", "dataSource": "events",
        "columns": ["event_type"], "limit": 2}""")
      assert(ok == 200, okBody)
      assert(mapper.readTree(okBody).get(0).path("events").size == 2)
      // the SQL endpoint rides the same cap
      val (sc, sbody) = postTo(port, "/druid/v2/sql",
        """{"query": "SELECT * FROM events"}""")
      assert(sc == 400 &&
        mapper.readTree(sbody).path("error").asText() == "Resource limit exceeded")
    }
  }

  test("lookup management: coordinator register, introspect, SQL use, delete") {
    withServer { port =>
      val spec = """{"version": "v1", "lookupExtractorFactory":
        {"type": "map", "map": {"click": "Click!", "view": "View!"}}}"""
      val (rc, rbody) = sendTo(port, "POST",
        "/druid/coordinator/v1/lookups/config/__default/evt_names", spec)
      assert(rc == 200, rbody)
      // introspection endpoints see the registered map
      val (ic, ibody) = sendTo(port, "GET",
        "/druid/v1/lookups/introspect/evt_names")
      assert(ic == 200 &&
        mapper.readTree(ibody).path("click").asText() == "Click!")
      val (kc, kbody) = sendTo(port, "GET",
        "/druid/v1/lookups/introspect/evt_names/keys")
      assert(kc == 200 && mapper.readTree(kbody).size == 2)
      // the config listing and per-lookup spec round-trip
      val (_, listBody) = sendTo(port, "GET", "/druid/coordinator/v1/lookups/config")
      assert(mapper.readTree(listBody).path("__default").toString.contains("evt_names"))
      val (_, specBody) = sendTo(port, "GET",
        "/druid/coordinator/v1/lookups/config/__default/evt_names")
      assert(mapper.readTree(specBody).path("lookupExtractorFactory")
        .path("map").path("view").asText() == "View!")
      // LOOKUP() in SQL resolves through the registered map immediately
      val (qc, qbody) = postTo(port, "/druid/v2/sql", """{"query":
        "SELECT LOOKUP(event_type, 'evt_names') AS label, COUNT(*) AS n FROM events GROUP BY 1 ORDER BY 1"}""")
      assert(qc == 200, qbody)
      assert(mapper.readTree(qbody).get(0).path("label").asText() == "Click!")
      // non-string map values are a malformed spec: loud 400, nothing
      // silently registered as ""
      val (badc, _) = sendTo(port, "POST",
        "/druid/coordinator/v1/lookups/config/__default/bad_map",
        """{"lookupExtractorFactory": {"type": "map",
            "map": {"k": {"nested": 1}}}}""")
      assert(badc == 400)
      assert(graft.sql.DruidLookups.get("bad_map").isEmpty)
      // delete, then introspection 400s
      val (dc, _) = sendTo(port, "DELETE",
        "/druid/coordinator/v1/lookups/config/__default/evt_names")
      assert(dc == 200)
      val (gc, _) = sendTo(port, "GET", "/druid/v1/lookups/introspect/evt_names")
      assert(gc == 400)
      graft.sql.DruidLookups.unregister("evt_names") // idempotent cleanup
    }
  }

  test("POST /druid/v2: timeBoundary answers the timestamp/result envelope") {
    withServer { port =>
      val (code, body) = post(port,
        """{"queryType": "timeBoundary", "dataSource": "events"}""")
      assert(code == 200, body)
      val arr = mapper.readTree(body)
      assert(arr.size == 1)
      val e = arr.get(0)
      assert(e.path("timestamp").asText() == "2024-01-01T01:00:00.000Z")
      assert(e.path("result").path("minTime").asText() == "2024-01-01T01:00:00.000Z")
      assert(e.path("result").path("maxTime").asText() == "2024-01-03T01:00:00.000Z")
      // single-bound variant keys the timestamp off that bound
      val (_, mx) = post(port, """{"queryType": "timeBoundary",
        "dataSource": "events", "bound": "maxTime"}""")
      assert(mapper.readTree(mx).get(0).path("timestamp").asText() ==
        "2024-01-03T01:00:00.000Z")
    }
  }

  test("POST /druid/v2: search answers Druid's timestamp/result envelope") {
    withServer { port =>
      val (code, body) = post(port, """{
        "queryType": "search", "dataSource": "events",
        "granularity": "day",
        "searchDimensions": ["event_type"],
        "query": {"type": "insensitive_contains", "value": "c"}
      }""")
      assert(code == 200, body)
      val arr = mapper.readTree(body)
      // "click" hits on Jan 1 and Jan 2 in the 5-row fixture
      assert(arr.size == 2)
      assert(arr.get(0).path("timestamp").asText() == "2024-01-01T00:00:00.000Z")
      val hit = arr.get(0).path("result").get(0)
      assert(hit.path("dimension").asText() == "event_type" &&
        hit.path("value").asText() == "click" && hit.path("count").asLong() == 1L)
      assert(arr.get(1).path("result").get(0).path("count").asLong() == 2L)
    }
  }

  test("hostile payloads get clean 4xx responses and never kill the server") {
    withServer { port =>
      val payloads = Seq("", "{", "[1,2", "\u0000\u0001\u0002",
        "{\"queryType\": null}", "{\"queryType\": {}}",
        "{\"queryType\": \"groupBy\"}",
        "{\"queryType\": \"scan\", \"dataSource\": {\"type\": \"query\"}}",
        "x" * 100000,
        "{\"queryType\": \"timeseries\", \"dataSource\": \"events\", " +
          "\"aggregations\": [{\"type\": \"longSum\"}]}")
      for (p <- payloads; path <- Seq("/druid/v2", "/druid/v2/sql")) {
        val (code, body) = postTo(port, path, p)
        assert(code == 400, s"payload ${p.take(30)} on $path: $code $body")
        assert(mapper.readTree(body).has("error"), "error envelope shape")
      }
      // and the server still answers real traffic afterwards
      val (ok, _) = post(port, """{
        "queryType": "timeseries", "dataSource": "events",
        "granularity": "all",
        "aggregations": [{"type": "count", "name": "n"}]}""")
      assert(ok == 200)
      assert(sendTo(port, "GET", "/status")._1 == 200)
    }
  }

  test("GET /status answers; bad query returns a Druid-style error object") {
    withServer { port =>
      val client = HttpClient.newHttpClient()
      val st = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/status"))
          .GET().build(), HttpResponse.BodyHandlers.ofString())
      assert(st.statusCode() == 200 &&
        mapper.readTree(st.body()).has("version"))
      val (code, body) = post(port, """{"queryType": "unknowable", "dataSource": "events"}""")
      assert(code == 400)
      val err = mapper.readTree(body)
      assert(err.has("error") && err.path("errorMessage").asText()
        .contains("unknowable"))
    }
  }

  // ---- concurrency + SQL context ------------------------------------------

  /** A two-row frame whose scan sleeps ~1.5 s (rows land in separate
    * partitions, sleeps overlap) — the "slow query" for the
    * concurrency and timeout specs.
    */
  private def slowFrame: DataFrame = {
    val sleep = udf { (ms: Long) => Thread.sleep(ms); ms }
    spark.range(2).select(sleep(lit(1500L)).as("slept"))
  }

  private def withSlowServer[A](body: Int => A): A = {
    val server = DruidServe.start(spark, _ => events, port = 0,
      sqlTables = Map("events" -> events, "slow" -> slowFrame), threads = 4)
    try body(server.getAddress.getPort) finally server.stop(0)
  }

  private def asyncPost(port: Int, path: String, json: String)
      : java.util.concurrent.CompletableFuture[HttpResponse[String]] =
    HttpClient.newHttpClient().sendAsync(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(json)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("/status and a second query answer WHILE a slow query runs") {
    withSlowServer { port =>
      val slowFut = asyncPost(port, "/druid/v2/sql",
        """{"query": "SELECT sum(slept) AS s FROM slow"}""")
      Thread.sleep(200) // let the slow scan start
      // on a single-dispatch-thread server both of these would block
      // until the slow query finished — the !isDone checks pin that
      // they answered concurrently, not after
      assert(sendTo(port, "GET", "/status")._1 == 200)
      assert(!slowFut.isDone, "slow query finished before /status answered")
      val (c2, b2) = postTo(port, "/druid/v2/sql",
        """{"query": "SELECT count(*) AS c FROM events"}""")
      assert(c2 == 200 && mapper.readTree(b2).get(0).path("c").asLong() == 5L)
      assert(!slowFut.isDone, "slow query finished before the fast query")
      val slowResp = slowFut.get(30, java.util.concurrent.TimeUnit.SECONDS)
      assert(slowResp.statusCode() == 200)
      assert(mapper.readTree(slowResp.body()).get(0).path("s").asLong() == 3000L)
    }
  }

  test("parallel SQL posts answer independently — no cross-request bleed") {
    withServer { port =>
      val futs = (1 to 12).map { i =>
        i -> asyncPost(port, "/druid/v2/sql",
          s"""{"query": "SELECT $i * count(*) AS v FROM events"}""")
      }
      futs.foreach { case (i, f) =>
        val resp = f.get(60, java.util.concurrent.TimeUnit.SECONDS)
        assert(resp.statusCode() == 200, s"query $i: ${resp.body()}")
        assert(mapper.readTree(resp.body()).get(0).path("v").asLong() == i * 5L,
          s"query $i answered another request's rows")
      }
    }
  }

  test("context.sqlTimeZone scopes rendering AND session time functions") {
    withServer { port =>
      // 2024-01-02T01:00:00Z == 2024-01-01T17:00:00-08:00
      val (c1, b1) = postTo(port, "/druid/v2/sql",
        """{"query": "SELECT __time FROM events WHERE user_id = 3",
            "context": {"sqlTimeZone": "America/Los_Angeles"}}""")
      assert(c1 == 200, b1)
      assert(mapper.readTree(b1).get(0).path("__time").asText()
        == "2024-01-01T17:00:00.000-08:00")
      // the child session's conf shifted too (CAST renders in session tz)
      val (c2, b2) = postTo(port, "/druid/v2/sql",
        """{"query": "SELECT CAST(__time AS STRING) AS ts FROM events WHERE user_id = 3",
            "context": {"sqlTimeZone": "America/Los_Angeles"}}""")
      assert(c2 == 200, b2)
      assert(mapper.readTree(b2).get(0).path("ts").asText()
        .startsWith("2024-01-01 17:00:00"))
      // a concurrent/subsequent UTC request is untouched
      val (c3, b3) = postTo(port, "/druid/v2/sql",
        """{"query": "SELECT __time FROM events WHERE user_id = 3"}""")
      assert(c3 == 200 && mapper.readTree(b3).get(0).path("__time").asText()
        == "2024-01-02T01:00:00.000Z")
      // garbage zone fails loudly
      val (c4, b4) = postTo(port, "/druid/v2/sql",
        """{"query": "SELECT 1", "context": {"sqlTimeZone": "Mars/Olympus"}}""")
      assert(c4 == 400 && b4.contains("Mars/Olympus"))
    }
  }

  test("context.timeout answers Druid's QueryTimeoutException envelope (504)") {
    withSlowServer { port =>
      val t0 = System.nanoTime()
      val (code, body) = postTo(port, "/druid/v2/sql",
        """{"query": "SELECT sum(slept) AS s FROM slow",
            "context": {"timeout": 400}}""")
      val ms = (System.nanoTime() - t0) / 1000000L
      assert(code == 504, s"$code $body")
      assert(mapper.readTree(body).path("errorClass").asText()
        == "QueryTimeoutException")
      assert(ms < 10000, s"timeout answer took ${ms}ms — cancellation didn't fire")
      // the server is healthy afterwards and answers real queries
      val (c2, b2) = postTo(port, "/druid/v2/sql",
        """{"query": "SELECT count(*) AS c FROM events"}""")
      assert(c2 == 200 && mapper.readTree(b2).get(0).path("c").asLong() == 5L)
    }
  }

  test("unknown SQL context keys are rejected loudly, cache hints ignored") {
    withServer { port =>
      val (code, body) = postTo(port, "/druid/v2/sql",
        """{"query": "SELECT 1", "context": {"useApproximateCountDistinct": false}}""")
      assert(code == 400 && body.contains("useApproximateCountDistinct"))
      // result-neutral cache hints pass
      val (c2, _) = postTo(port, "/druid/v2/sql",
        """{"query": "SELECT 1 AS one", "context": {"useCache": false, "populateCache": false}}""")
      assert(c2 == 200)
    }
  }

  test("numeric ARRAY results serialize as JSON arrays, not Seq strings") {
    withServer { port =>
      val (code, body) = postTo(port, "/druid/v2/sql",
        """{"query": "SELECT array(1, 2, 3) AS xs, array(1.5D, 2.5D) AS ds, array('a', 'b') AS ss"}""")
      assert(code == 200, body)
      val row = mapper.readTree(body).get(0)
      assert(row.path("xs").isArray && row.path("xs").get(0).isIntegralNumber
        && row.path("xs").get(0).asLong() == 1L)
      assert(row.path("ds").get(1).asDouble() == 2.5)
      assert(row.path("ss").get(1).asText() == "b")
      // nested arrays, timestamp elements, and narrow numerics render
      // per their DECLARED type, same as their scalar twins
      val (c2, b2) = postTo(port, "/druid/v2/sql",
        """{"query": "SELECT array(array(1, 2), array(3)) AS nested, array(TIMESTAMP '2024-01-02 03:04:05') AS tss, array(CAST(7 AS SMALLINT)) AS shorts"}""")
      assert(c2 == 200, b2)
      val r2 = mapper.readTree(b2).get(0)
      assert(r2.path("nested").get(0).isArray &&
        r2.path("nested").get(0).get(1).asLong() == 2L)
      assert(r2.path("tss").get(0).asText() == "2024-01-02T03:04:05.000Z")
      assert(r2.path("shorts").get(0).isIntegralNumber &&
        r2.path("shorts").get(0).asInt() == 7)
    }
  }

  test("DELETE /druid/v2/sql/{id} cancels a running query") {
    withSlowServer { port =>
      val slowFut = asyncPost(port, "/druid/v2/sql",
        """{"query": "SELECT sum(slept) AS s FROM slow",
            "context": {"sqlQueryId": "kill-me"}}""")
      Thread.sleep(300) // let the scan start
      val (code, body) = sendTo(port, "DELETE", "/druid/v2/sql/kill-me")
      assert(code == 202 && body.contains("kill-me"))
      val resp = slowFut.get(30, java.util.concurrent.TimeUnit.SECONDS)
      assert(resp.statusCode() == 500, resp.body())
      assert(mapper.readTree(resp.body()).path("errorClass").asText()
        == "QueryInterruptedException")
      // cancelling an unknown id still answers 202 (Druid semantics —
      // the query may have just finished; cancellation is racy)
      assert(sendTo(port, "DELETE", "/druid/v2/sql/no-such-query")._1 == 202)
      // the server stays healthy
      val (c2, b2) = postTo(port, "/druid/v2/sql",
        """{"query": "SELECT count(*) AS c FROM events"}""")
      assert(c2 == 200 && mapper.readTree(b2).get(0).path("c").asLong() == 5L)
    }
  }

  test("EXPLAIN PLAN FOR answers Druid's PLAN/RESOURCES/ATTRIBUTES row") {
    withServer { port =>
      val (code, body) = postTo(port, "/druid/v2/sql",
        """{"query": "EXPLAIN PLAN FOR SELECT event_type, count(*) FROM events GROUP BY event_type"}""")
      assert(code == 200, body)
      val row = mapper.readTree(body).get(0)
      assert(row.path("PLAN").asText().contains("Aggregate"))
      val res = mapper.readTree(row.path("RESOURCES").asText())
      assert(res.size == 1 && res.get(0).path("name").asText() == "events"
        && res.get(0).path("type").asText() == "DATASOURCE")
      assert(row.path("ATTRIBUTES").asText().contains("SELECT"))
      // case-insensitive, and the inner query still analyzes for real
      // (a bad inner query is a loud 400, not a phantom plan)
      val (c2, _) = postTo(port, "/druid/v2/sql",
        """{"query": "explain plan for select 1"}""")
      assert(c2 == 200)
      val (c3, _) = postTo(port, "/druid/v2/sql",
        """{"query": "EXPLAIN PLAN FOR SELECT no_such_col FROM events"}""")
      assert(c3 == 400)
    }
  }

  test("X-Druid-Query-Id round-trips (sql + native), generated when absent") {
    withServer { port =>
      def idOf(path: String, json: String): (Int, String) = {
        val resp = HttpClient.newHttpClient().send(
          HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
            .header("Content-Type", "application/json")
            .POST(HttpRequest.BodyPublishers.ofString(json)).build(),
          HttpResponse.BodyHandlers.ofString())
        (resp.statusCode(),
          resp.headers().firstValue("X-Druid-Query-Id").orElse(""))
      }
      val (c1, id1) = idOf("/druid/v2/sql",
        """{"query": "SELECT 1 AS one", "context": {"sqlQueryId": "my-id-1"}}""")
      assert(c1 == 200 && id1 == "my-id-1")
      val (c2, id2) = idOf("/druid/v2/sql", """{"query": "SELECT 1 AS one"}""")
      assert(c2 == 200 && id2.nonEmpty)
      val (c3, id3) = idOf("/druid/v2", """{
        "queryType": "timeseries", "dataSource": "events",
        "granularity": "all",
        "aggregations": [{"type": "count", "name": "n"}],
        "context": {"queryId": "native-7"}}""")
      assert(c3 == 200 && id3 == "native-7")
      // error responses carry the id too (set before execution)
      val (c4, id4) = idOf("/druid/v2/sql",
        """{"query": "SELECT FROM nothing", "context": {"sqlQueryId": "bad-1"}}""")
      assert(c4 == 400 && id4 == "bad-1")
    }
  }

  test("X-Druid-Response-Context answers query id, row count, timing") {
    withServer { port =>
      val resp = HttpClient.newHttpClient().send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/druid/v2"))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString("""{
            "queryType": "timeseries", "dataSource": "events",
            "granularity": "day",
            "aggregations": [{"type": "count", "name": "n"}],
            "context": {"queryId": "rc-1"}}""")).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 200)
      val rc = resp.headers().firstValue("X-Druid-Response-Context").orElse("")
      assert(rc.nonEmpty, "missing X-Druid-Response-Context header")
      val node = mapper.readTree(rc)
      assert(node.path("queryId").asText() == "rc-1")
      // events span 3 days -> 3 zero-fill-free buckets
      assert(node.path("count").asLong() == 3)
      assert(node.path("timeMs").asLong() >= 0)
      assert(node.path("missingSegments").isArray &&
        node.path("missingSegments").size() == 0)
    }
  }

  test("GET /druid/v2/candidates lists exactly the planner's surviving segments") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cand")
      .toString + "/t"
    events.repartition(1).write.format("druid")
      .option("segmentGranularity", "day").mode("overwrite").save(dir)
    val segDf = spark.read.format("druid").load(dir)
    val server = DruidServe.start(spark, _ => events, port = 0,
      sqlTables = Map("events" -> events, "seg" -> segDf))
    try {
      val port = server.getAddress.getPort
      val (c0, all) = sendTo(port, "GET", "/druid/v2/candidates?datasource=seg")
      assert(c0 == 200)
      val metas = graft.sources.druid.SegmentCatalog.metaFor(dir)
      assert(mapper.readTree(all).size() == metas.size && metas.size == 3)
      // one-day interval: the candidate list must equal the planner's
      // interval pruning for the same range
      val iv = java.net.URLEncoder.encode(
        "2024-01-02T00:00:00.000Z/2024-01-03T00:00:00.000Z", "UTF-8")
      val (c1, one) = sendTo(port, "GET",
        s"/druid/v2/candidates?datasource=seg&intervals=$iv")
      assert(c1 == 200)
      val oneN = mapper.readTree(one)
      val prunedParts = segDf.filter(
          col("__time") >= to_timestamp(lit("2024-01-02 00:00:00")) &&
          col("__time") < to_timestamp(lit("2024-01-03 00:00:00")))
        .rdd.getNumPartitions
      assert(oneN.size() == prunedParts && oneN.size() == 1,
        s"candidates ${oneN.size()} vs planner $prunedParts")
      val e = oneN.get(0)
      assert(e.path("interval").asText().startsWith("2024-01-02T"))
      assert(e.path("size").asLong() == 2) // Jan 2 holds two events
      assert(e.path("locations").size() == 1 &&
        e.path("locations").get(0).path("host").asText()
          .endsWith(s":$port"))
      // unknown datasource is a loud 400; a non-segment view lists []
      assert(sendTo(port, "GET",
        "/druid/v2/candidates?datasource=nope")._1 == 400)
      assert(mapper.readTree(sendTo(port, "GET",
        "/druid/v2/candidates?datasource=events")._2).size() == 0)
    } finally server.stop(0)
  }

  // ---- async SQL statements API -------------------------------------------

  private def withStatementServer[A](pageRows: Int)(body: Int => A): A = {
    val server = DruidServe.start(spark, _ => events, port = 0,
      sqlTables = Map("events" -> events, "slow" -> slowFrame),
      threads = 4, statementPageRows = pageRows)
    try body(server.getAddress.getPort) finally server.stop(0)
  }

  /** Poll GET /druid/v2/sql/statements/{id} until a terminal state. */
  private def awaitTerminal(port: Int, id: String,
                            timeoutMs: Long = 30000): com.fasterxml.jackson.databind.JsonNode = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var last: com.fasterxml.jackson.databind.JsonNode = null
    while (System.nanoTime() < deadline) {
      val (code, body) = sendTo(port, "GET", s"/druid/v2/sql/statements/$id")
      assert(code == 200, body)
      last = mapper.readTree(body)
      val st = last.path("state").asText()
      if (st == "SUCCESS" || st == "FAILED" || st == "CANCELED") return last
      Thread.sleep(50)
    }
    fail(s"statement $id did not reach a terminal state: $last")
  }

  test("statements API: POST/poll/results lifecycle with paging") {
    withStatementServer(pageRows = 2) { port =>
      val (code, body) = postTo(port, "/druid/v2/sql/statements",
        """{"query": "SELECT event_type, user_id FROM events ORDER BY __time",
            "context": {"sqlQueryId": "stmt-1", "executionMode": "ASYNC"}}""")
      assert(code == 200, body)
      val sub = mapper.readTree(body)
      assert(sub.path("queryId").asText() == "stmt-1")
      assert(Set("ACCEPTED", "RUNNING", "SUCCESS")(sub.path("state").asText()))
      assert(sub.path("createdAt").asText().nonEmpty)
      val fin = awaitTerminal(port, "stmt-1")
      assert(fin.path("state").asText() == "SUCCESS", fin.toString)
      assert(fin.path("durationMs").asLong() >= 0)
      // schema: name/type/nativeType per column
      val schema = fin.path("schema")
      assert(schema.size() == 2)
      assert(schema.get(0).path("name").asText() == "event_type")
      assert(schema.get(0).path("type").asText() == "VARCHAR")
      assert(schema.get(0).path("nativeType").asText() == "STRING")
      assert(schema.get(1).path("type").asText() == "BIGINT")
      // result summary: 5 rows over 3 pages of <= 2 rows
      val result = fin.path("result")
      assert(result.path("numTotalRows").asLong() == 5L)
      assert(result.path("resultFormat").asText() == "object")
      val pages = result.path("pages")
      assert(pages.size() == 3)
      assert((0 until 3).map(i => pages.get(i).path("numRows").asLong()).sum == 5L)
      assert((0 until 3).forall(i => pages.get(i).path("sizeInBytes").asLong() > 0))
      // full results
      val (rc, rb) = sendTo(port, "GET", "/druid/v2/sql/statements/stmt-1/results")
      assert(rc == 200, rb)
      val rows = mapper.readTree(rb)
      assert(rows.size() == 5)
      assert(rows.get(0).path("event_type").asText() == "click")
      assert(rows.get(4).path("user_id").asLong() == 2L)
      // per-page results concatenate to the full set
      val paged = (0 until 3).flatMap { i =>
        val (pc, pb) = sendTo(port, "GET",
          s"/druid/v2/sql/statements/stmt-1/results?page=$i")
        assert(pc == 200, pb)
        val arr = mapper.readTree(pb)
        (0 until arr.size()).map(j => arr.get(j).toString)
      }
      assert(paged == (0 until 5).map(j => rows.get(j).toString))
      // invalid page and unknown id are loud
      assert(sendTo(port, "GET",
        "/druid/v2/sql/statements/stmt-1/results?page=7")._1 == 400)
      assert(sendTo(port, "GET", "/druid/v2/sql/statements/nope")._1 == 404)
      assert(sendTo(port, "GET", "/druid/v2/sql/statements/nope/results")._1 == 404)
    }
  }

  test("statements API: failure surfaces as FAILED with errorDetails") {
    withStatementServer(pageRows = 100) { port =>
      val (code, body) = postTo(port, "/druid/v2/sql/statements",
        """{"query": "SELECT no_such_col FROM events",
            "context": {"sqlQueryId": "stmt-bad"}}""")
      assert(code == 200, body) // submission succeeds; FAILURE is async
      val fin = awaitTerminal(port, "stmt-bad")
      assert(fin.path("state").asText() == "FAILED", fin.toString)
      val err = fin.path("errorDetails")
      assert(err.path("error").asText() == "druidException")
      assert(err.path("errorMessage").asText().nonEmpty)
      // results of a failed statement are a 400, not an empty 200
      assert(sendTo(port, "GET",
        "/druid/v2/sql/statements/stmt-bad/results")._1 == 400)
    }
  }

  test("statements API: DELETE cancels a running statement") {
    withStatementServer(pageRows = 100) { port =>
      val (code, _) = postTo(port, "/druid/v2/sql/statements",
        """{"query": "SELECT sum(slept) AS s FROM slow",
            "context": {"sqlQueryId": "stmt-kill"}}""")
      assert(code == 200)
      Thread.sleep(300) // let the scan start
      val (dc, db) = sendTo(port, "DELETE", "/druid/v2/sql/statements/stmt-kill")
      assert(dc == 202, db)
      val fin = awaitTerminal(port, "stmt-kill")
      assert(fin.path("state").asText() == "CANCELED", fin.toString)
      // terminal DELETE is a 200 no-op; unknown id is 404
      assert(sendTo(port, "DELETE", "/druid/v2/sql/statements/stmt-kill")._1 == 200)
      assert(sendTo(port, "DELETE", "/druid/v2/sql/statements/nope")._1 == 404)
      // the server stays healthy
      val (c2, b2) = postTo(port, "/druid/v2/sql",
        """{"query": "SELECT count(*) AS c FROM events"}""")
      assert(c2 == 200 && mapper.readTree(b2).get(0).path("c").asLong() == 5L)
    }
  }


  test("statements API: statements run in parallel, never starving sync HTTP") {
    withStatementServer(pageRows = 100) { port =>
      // two slow statements occupy the whole statement pool (threads/2 = 2)
      (1 to 2).foreach { i =>
        val (c, _) = postTo(port, "/druid/v2/sql/statements",
          s"""{"query": "SELECT sum(slept) AS s FROM slow",
               "context": {"sqlQueryId": "par-$i"}}""")
        assert(c == 200)
      }
      Thread.sleep(300)
      // BOTH are past ACCEPTED: a single-threaded statement runner
      // would still hold par-2 in ACCEPTED while par-1 sleeps — this
      // is the pool-parallelism assertion
      val states = (1 to 2).map { i =>
        mapper.readTree(sendTo(port, "GET",
          s"/druid/v2/sql/statements/par-$i")._2).path("state").asText()
      }
      assert(states.forall(st => st == "RUNNING" || st == "SUCCESS"), states)
      // HTTP threads are not starved: /status (no Spark work) answers
      // immediately while the statement pool is saturated
      val t0 = System.nanoTime()
      assert(sendTo(port, "GET", "/status")._1 == 200)
      val statusMs = (System.nanoTime() - t0) / 1000000
      assert(statusMs < 1000, s"/status took ${statusMs}ms under load")
      // a sync query still ANSWERS correctly (its Spark job may queue
      // behind the sleeping tasks on the local[4] test cluster — core
      // contention, not HTTP starvation — so no latency bound here)
      val (c2, b2) = postTo(port, "/druid/v2/sql",
        """{"query": "SELECT count(*) AS c FROM events"}""")
      assert(c2 == 200 && mapper.readTree(b2).get(0).path("c").asLong() == 5L)
      // both statements complete, in parallel (overlapping sleeps):
      // two sequential runs would take >= 2 x 1.5s from the poll start
      (1 to 2).foreach { i =>
        assert(awaitTerminal(port, s"par-$i").path("state").asText()
          == "SUCCESS")
      }
    }
  }

  test("statements API: validation — executionMode, duplicate ids, routes") {
    withStatementServer(pageRows = 100) { port =>
      // non-ASYNC executionMode is rejected loudly
      val (mc, mb) = postTo(port, "/druid/v2/sql/statements",
        """{"query": "SELECT 1", "context": {"executionMode": "SYNC"}}""")
      assert(mc == 400 && mb.contains("executionMode"), mb)
      // a second submit under a RUNNING id is rejected; after the
      // first finishes, the id is reusable
      val (c1, _) = postTo(port, "/druid/v2/sql/statements",
        """{"query": "SELECT sum(slept) AS s FROM slow",
            "context": {"sqlQueryId": "stmt-dup"}}""")
      assert(c1 == 200)
      val (c2, b2) = postTo(port, "/druid/v2/sql/statements",
        """{"query": "SELECT 1", "context": {"sqlQueryId": "stmt-dup"}}""")
      assert(c2 == 400 && b2.contains("already running"), b2)
      assert(awaitTerminal(port, "stmt-dup").path("state").asText() == "SUCCESS")
      val (c3, _) = postTo(port, "/druid/v2/sql/statements",
        """{"query": "SELECT 2 AS two", "context": {"sqlQueryId": "stmt-dup"}}""")
      assert(c3 == 200)
      assert(awaitTerminal(port, "stmt-dup").path("state").asText() == "SUCCESS")
      // the sync SQL DELETE no longer treats multi-segment paths as
      // cancel ids (the statements route owns its own subtree)
      assert(sendTo(port, "DELETE", "/druid/v2/sql/foo/bar")._1 == 405)
      // unknown statements sub-routes are not cancels either
      assert(sendTo(port, "DELETE",
        "/druid/v2/sql/statements/a/b/c")._1 == 404)
    }
  }

  test("SQL window functions answer over the HTTP wire (Druid 28+ surface)") {
    withServer { port =>
      val q = Seq(
        "SELECT event_type, n,",
        "CAST(sum(n) OVER (ORDER BY event_type ROWS BETWEEN UNBOUNDED",
        "PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,",
        "CAST(rank() OVER (ORDER BY n DESC, event_type) AS BIGINT) AS rnk",
        "FROM (SELECT event_type, count(*) AS n FROM events GROUP BY 1)",
        "ORDER BY event_type").mkString(" ")
      val (code, body) = postTo(port, "/druid/v2/sql",
        s"""{"query": "$q"}""")
      assert(code == 200, body)
      val rows = mapper.readTree(body)
      assert(rows.size() > 0, body)
      // cumulative sum on the last row equals the total row count
      assert(rows.get(rows.size() - 1).path("cum").asLong() == 5L, body)
    }
  }

  test("SQL context: result-neutral operational keys are accepted") {
    withServer { port =>
      val (code, body) = postTo(port, "/druid/v2/sql",
        """{"query": "SELECT count(*) AS c FROM events",
            "context": {"priority": 10, "lane": "low", "finalize": true,
                        "brokerService": "b", "vectorize": "force"}}""")
      assert(code == 200, body)
      assert(mapper.readTree(body).get(0).path("c").asLong() == 5L)
      // semantics-changing keys still 400 loudly
      val (c2, b2) = postTo(port, "/druid/v2/sql",
        """{"query": "SELECT 1",
            "context": {"useApproximateCountDistinct": false}}""")
      assert(c2 == 400 && b2.contains("useApproximateCountDistinct"))
    }
  }

  // ---- SQL ingestion through the statements API ---------------------------

  private def withIngestServer[A](body: (Int, String) => A): A = {
    val root = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val server = DruidServe.start(spark, _ => events, port = 0,
      sqlTables = Map("events" -> events, "slow" -> slowFrame),
      threads = 4, ingestRoot = Some(root))
    try body(server.getAddress.getPort, root) finally server.stop(0)
  }

  test("statements API: INSERT INTO ... PARTITIONED BY ingests a queryable datasource") {
    withIngestServer { (port, root) =>
      val (code, body) = postTo(port, "/druid/v2/sql/statements",
        """{"query": "INSERT INTO clicks SELECT __time, event_type, user_id, value FROM events WHERE event_type = 'click' PARTITIONED BY DAY CLUSTERED BY user_id",
            "context": {"sqlQueryId": "ing-1"}}""")
      assert(code == 200, body)
      val fin = awaitTerminal(port, "ing-1")
      assert(fin.path("state").asText() == "SUCCESS", fin.toString)
      assert(fin.path("result").path("dataSource").asText() == "clicks")
      assert(fin.path("result").path("numTotalRows").asLong() == 3L)
      // PARTITIONED BY DAY: the 3 clicks span 2 days -> >= 2 segment dirs
      val segs = new java.io.File(s"$root/clicks").listFiles()
        .filter(f => f.isDirectory && !f.getName.startsWith("."))
      assert(segs.length >= 2, segs.map(_.getName).mkString(", "))
      // immediately queryable: sync SQL, native query, discovery
      val (c2, b2) = postTo(port, "/druid/v2/sql",
        """{"query": "SELECT count(*) AS c, sum(user_id) AS u FROM clicks"}""")
      assert(c2 == 200, b2)
      val row = mapper.readTree(b2).get(0)
      assert(row.path("c").asLong() == 3L && row.path("u").asLong() == 5L)
      val (c3, b3) = post(port, """{
        "queryType": "timeseries", "dataSource": "clicks",
        "granularity": "all",
        "aggregations": [{"type": "count", "name": "n"}]}""")
      assert(c3 == 200 && b3.contains("\"n\":3"), b3)
      val (c4, b4) = sendTo(port, "GET", "/druid/v2/datasources")
      assert(c4 == 200 && b4.contains("clicks"), b4)
      // INSERT appends: count doubles
      val (c5, _) = postTo(port, "/druid/v2/sql/statements",
        """{"query": "INSERT INTO clicks SELECT __time, event_type, user_id, value FROM events WHERE event_type = 'click' PARTITIONED BY DAY",
            "context": {"sqlQueryId": "ing-2"}}""")
      assert(c5 == 200)
      assert(awaitTerminal(port, "ing-2").path("state").asText() == "SUCCESS")
      val (c6, b6) = postTo(port, "/druid/v2/sql",
        """{"query": "SELECT count(*) AS c FROM clicks"}""")
      assert(c6 == 200 && mapper.readTree(b6).get(0).path("c").asLong() == 6L)
      // REPLACE OVERWRITE ALL swaps the whole table
      val (c7, _) = postTo(port, "/druid/v2/sql/statements",
        """{"query": "REPLACE INTO clicks OVERWRITE ALL SELECT __time, event_type, user_id, value FROM events WHERE event_type = 'view' PARTITIONED BY ALL",
            "context": {"sqlQueryId": "ing-3"}}""")
      assert(c7 == 200)
      assert(awaitTerminal(port, "ing-3").path("state").asText() == "SUCCESS")
      val (c8, b8) = postTo(port, "/druid/v2/sql",
        """{"query": "SELECT count(*) AS c, min(event_type) AS e FROM clicks"}""")
      val r8 = mapper.readTree(b8).get(0)
      assert(c8 == 200 && r8.path("c").asLong() == 2L
        && r8.path("e").asText() == "view")
    }
  }

  test("statements API: REPLACE OVERWRITE WHERE backfills one day atomically") {
    withIngestServer { (port, _) =>
      val (c1, _) = postTo(port, "/druid/v2/sql/statements",
        """{"query": "REPLACE INTO ev2 OVERWRITE ALL SELECT __time, event_type, user_id, value FROM events PARTITIONED BY DAY",
            "context": {"sqlQueryId": "bk-1"}}""")
      assert(c1 == 200)
      assert(awaitTerminal(port, "bk-1").path("state").asText() == "SUCCESS")
      val (c2, _) = postTo(port, "/druid/v2/sql/statements",
        """{"query": "REPLACE INTO ev2 OVERWRITE WHERE __time >= TIMESTAMP '2024-01-02 00:00:00' AND __time < TIMESTAMP '2024-01-03 00:00:00' SELECT TIMESTAMP '2024-01-02 06:00:00' AS __time, 'marker' AS event_type, CAST(99 AS BIGINT) AS user_id, CAST(0.5 AS DOUBLE) AS value PARTITIONED BY DAY",
            "context": {"sqlQueryId": "bk-2"}}""")
      assert(c2 == 200)
      val fin = awaitTerminal(port, "bk-2")
      assert(fin.path("state").asText() == "SUCCESS", fin.toString)
      assert(fin.path("result").path("numTotalRows").asLong() == 1L)
      val (c3, b3) = postTo(port, "/druid/v2/sql",
        """{"query": "SELECT CAST(date_trunc('DAY', __time) AS DATE) AS d, count(*) AS c, max(event_type) AS e FROM ev2 GROUP BY 1 ORDER BY 1"}""")
      assert(c3 == 200, b3)
      val days = mapper.readTree(b3)
      assert(days.size() == 3)
      // day 1 and day 3 untouched; day 2 replaced by the single marker
      assert(days.get(0).path("c").asLong() == 2L)
      assert(days.get(1).path("c").asLong() == 1L
        && days.get(1).path("e").asText() == "marker")
      assert(days.get(2).path("c").asLong() == 1L)
    }
  }

  test("statements API: ingestion validation is loud") {
    withIngestServer { (port, _) =>
      // PARTITIONED BY is required
      val (c1, b1) = postTo(port, "/druid/v2/sql/statements",
        """{"query": "INSERT INTO t SELECT * FROM events"}""")
      assert(c1 == 400 && b1.contains("PARTITIONED BY"), b1)
      // the sync endpoint refuses ingestion outright
      val (c2, b2) = postTo(port, "/druid/v2/sql",
        """{"query": "INSERT INTO t SELECT * FROM events PARTITIONED BY DAY"}""")
      assert(c2 == 400 && b2.contains("statements"), b2)
      // dataSource names cannot traverse paths
      val (c3, b3) = postTo(port, "/druid/v2/sql/statements",
        """{"query": "INSERT INTO ../evil SELECT * FROM events PARTITIONED BY DAY"}""")
      assert(c3 == 400 && b3.contains("invalid"), b3)
      // a SELECT without __time fails loudly (async, in the status)
      val (c4, _) = postTo(port, "/druid/v2/sql/statements",
        """{"query": "INSERT INTO t2 SELECT event_type FROM events PARTITIONED BY ALL",
            "context": {"sqlQueryId": "bad-ing"}}""")
      assert(c4 == 200)
      val fin = awaitTerminal(port, "bad-ing")
      assert(fin.path("state").asText() == "FAILED")
      assert(fin.path("errorDetails").path("errorMessage").asText()
        .contains("__time"))
    }
  }

  test("rollup registered over a served table stops routing after a statements-API ingest") {
    withIngestServer { (port, root) =>
      // create the base table over HTTP
      val (c1, _) = postTo(port, "/druid/v2/sql/statements",
        """{"query": "INSERT INTO rbase SELECT __time, event_type, value FROM events PARTITIONED BY DAY",
            "context": {"sqlQueryId": "rr-1"}}""")
      assert(c1 == 200)
      assert(awaitTerminal(port, "rr-1").path("state").asText() == "SUCCESS")
      // register a (frozen) daily rollup of it
      import org.apache.spark.sql.functions._
      val druidBase = spark.read.format("druid").load(s"$root/rbase")
      val rdir = java.nio.file.Files
        .createTempDirectory("serve-rr").toString
      druidBase.groupBy(date_trunc("DAY", col("__time")).as("__time"),
          col("event_type"))
        .agg(sum(col("value")).as("value_sum"), count(lit(1)).as("cnt"))
        .write.mode("overwrite").parquet(rdir)
      graft.plans.RollupRouting.register(spark, druidBase,
        spark.read.parquet(rdir),
        timeCol = "__time", granularity = "DAY", dims = Seq("event_type"),
        sums = Map("value" -> "value_sum"), countCol = Some("cnt"))
      try {
        def q = druidBase.groupBy(col("event_type"))
          .agg(sum(col("value")).as("s"))
        def plan = q.queryExecution.executedPlan.toString
        assert(plan.contains(rdir), plan) // routes while fresh
        val before = q.collect()
          .map(r => r.getString(0) -> r.getDouble(1)).toMap
        // ingest into the base THROUGH THE STATEMENTS API
        val (c2, _) = postTo(port, "/druid/v2/sql/statements",
          """{"query": "INSERT INTO rbase SELECT __time, event_type, value FROM events WHERE event_type = 'view' PARTITIONED BY DAY",
              "context": {"sqlQueryId": "rr-2"}}""")
        assert(c2 == 200)
        assert(awaitTerminal(port, "rr-2").path("state").asText() == "SUCCESS")
        // the registration is now STALE: routing must stop, the raw
        // table (with the new rows) answers
        assert(!plan.contains(rdir), s"routed to a STALE rollup:\n$plan")
        val after = q.collect()
          .map(r => r.getString(0) -> r.getDouble(1)).toMap
        assert(math.abs(after("view") - (before("view") + 70.0)) < 1e-9,
          s"$after vs $before")
        assert(math.abs(after("click") - before("click")) < 1e-9)
      } finally graft.plans.RollupRouting.clear()
    }
  }

  test("MAINTAINED rollup keeps routing across a statements-API ingest (auto-refresh)") {
    withIngestServer { (port, root) =>
      val (c1, _) = postTo(port, "/druid/v2/sql/statements",
        """{"query": "INSERT INTO mbase SELECT __time, event_type, value FROM events PARTITIONED BY DAY",
            "context": {"sqlQueryId": "rm-1"}}""")
      assert(c1 == 200)
      assert(awaitTerminal(port, "rm-1").path("state").asText() == "SUCCESS")
      import org.apache.spark.sql.functions._
      val druidBase = spark.read.format("druid").load(s"$root/mbase")
      val rroot = java.nio.file.Files
        .createTempDirectory("serve-rm").toString
      graft.plans.RollupRouting.registerMaintained(spark, druidBase, rroot,
        timeCol = "__time", granularity = "DAY", dims = Seq("event_type"),
        sums = Map("value" -> "value_sum"), countCol = Some("cnt"))
      try {
        def q = druidBase.groupBy(col("event_type"))
          .agg(sum(col("value")).as("s"))
        def plan = q.queryExecution.executedPlan.toString
        assert(plan.contains(s"$rroot/v000001"), plan)
        val before = q.collect()
          .map(r => r.getString(0) -> r.getDouble(1)).toMap
        // ingest into the base THROUGH THE STATEMENTS API
        val (c2, _) = postTo(port, "/druid/v2/sql/statements",
          """{"query": "INSERT INTO mbase SELECT __time, event_type, value FROM events WHERE event_type = 'view' PARTITIONED BY DAY",
              "context": {"sqlQueryId": "rm-2"}}""")
        assert(c2 == 200)
        assert(awaitTerminal(port, "rm-2").path("state").asText() == "SUCCESS")
        // the next routed-shape query refreshes and ROUTES — to the
        // new version, with the new rows absorbed
        val p2 = plan
        assert(p2.contains(s"$rroot/v000002"),
          s"did not route to the refreshed rollup:\n$p2")
        val after = q.collect()
          .map(r => r.getString(0) -> r.getDouble(1)).toMap
        assert(math.abs(after("view") - (before("view") + 70.0)) < 1e-9,
          s"$after vs $before")
        assert(math.abs(after("click") - before("click")) < 1e-9)
      } finally graft.plans.RollupRouting.clear()
    }
  }

  test("statement retirement is oldest-first and never corrupted by a running head") {
    // a deterministically-blocked head: the UDF waits on a latch the
    // test releases, so "head still running" is not a timing race
    DruidServeSpec.retireGate = new java.util.concurrent.CountDownLatch(1)
    val gated = {
      val block = udf { (x: Long) =>
        DruidServeSpec.retireGate.await(
          60, java.util.concurrent.TimeUnit.SECONDS); x }
      spark.range(1).select(block(col("id")).as("slept"))
    }
    // bound = 2: retirement pressure after the third statement
    val server = DruidServe.start(spark, _ => events, port = 0,
      sqlTables = Map("events" -> events, "gated" -> gated),
      threads = 4, statementRetireBound = 2)
    val port = server.getAddress.getPort
    try {
      // a long-running statement at the HEAD of the order
      val (c0, _) = postTo(port, "/druid/v2/sql/statements",
        """{"query": "SELECT sum(slept) AS s FROM gated",
            "context": {"sqlQueryId": "ret-slow"}}""")
      assert(c0 == 200)
      // quick terminal statements pile up behind it
      (1 to 4).foreach { i =>
        val (c, _) = postTo(port, "/druid/v2/sql/statements",
          s"""{"query": "SELECT count(*) AS c FROM events",
               "context": {"sqlQueryId": "ret-$i"}}""")
        assert(c == 200)
        awaitTerminal(port, s"ret-$i")
      }
      // while the head RUNS nothing retires (order preserved, no
      // tail re-queue): every terminal statement is still queryable
      (1 to 4).foreach { i =>
        val (c, b) = sendTo(port, "GET", s"/druid/v2/sql/statements/ret-$i")
        assert(c == 200, s"ret-$i vanished while head was running: $b")
      }
      DruidServeSpec.retireGate.countDown()
      // the head's own completion triggers retirement (it retires
      // itself and the next-oldest down to the bound) — poll for it
      def code(id: String): Int =
        sendTo(port, "GET", s"/druid/v2/sql/statements/$id")._1
      val deadline = System.nanoTime() + 30000000000L
      while (code("ret-2") != 404 && System.nanoTime() < deadline)
        Thread.sleep(30)
      // OLDEST first: slow, ret-1, ret-2 retired; ret-3, ret-4 survive
      Seq("ret-slow", "ret-1", "ret-2").foreach(id =>
        assert(code(id) == 404, s"$id should have retired oldest-first"))
      Seq("ret-3", "ret-4").foreach(id =>
        assert(code(id) == 200, s"$id retired out of order"))
      // the next completion keeps retiring in order: ret-3 goes next
      val (c5, _) = postTo(port, "/druid/v2/sql/statements",
        """{"query": "SELECT count(*) AS c FROM events",
            "context": {"sqlQueryId": "ret-5"}}""")
      assert(c5 == 200)
      awaitTerminal(port, "ret-5")
      assert(code("ret-3") == 404, "ret-3 should have retired next")
      Seq("ret-4", "ret-5").foreach(id =>
        assert(code(id) == 200, s"$id retired out of order"))
    } finally server.stop(0)
  }

  test("a VirtualMachineError in a statement propagates out of the pool (not laundered)") {
    withServer { port =>
      val seen = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val prev = Thread.getDefaultUncaughtExceptionHandler
      Thread.setDefaultUncaughtExceptionHandler((_, e) =>
        if (e.isInstanceOf[VirtualMachineError] &&
            String.valueOf(e.getMessage).contains("synthetic")) seen.set(e))
      try {
        // a function whose BUILDER throws: analysis runs driver-side on
        // the statement pool thread, so the fake OOM exercises exactly
        // the runStatement catch path
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          "graft_test_vme",
          _ => throw new OutOfMemoryError("synthetic test VME"),
          "scala_udf")
        val (c, _) = postTo(port, "/druid/v2/sql/statements",
          """{"query": "SELECT graft_test_vme() AS x FROM events",
              "context": {"sqlQueryId": "vme-1"}}""")
        assert(c == 200)
        // pollers still see a terminal FAILED state (recorded BEFORE
        // the rethrow, so the lifecycle is never stuck)
        val fin = awaitTerminal(port, "vme-1")
        assert(fin.path("state").asText() == "FAILED", fin.toString)
        // ... and the error is NOT swallowed: it propagates out of the
        // statement pool to the thread's uncaught handler
        val deadline = System.nanoTime() + 10000000000L
        while (seen.get() == null && System.nanoTime() < deadline)
          Thread.sleep(20)
        assert(seen.get() != null,
          "VMError was swallowed - never left the statement pool")
      } finally {
        Thread.setDefaultUncaughtExceptionHandler(prev)
        spark.sessionState.functionRegistry.dropFunction(
          org.apache.spark.sql.catalyst.FunctionIdentifier("graft_test_vme"))
      }
    }
  }

  test("ingestion cannot shadow an in-memory served view") {
    withIngestServer { (port, _) =>
      val (c, _) = postTo(port, "/druid/v2/sql/statements",
        """{"query": "INSERT INTO events SELECT __time, event_type, user_id, value FROM events PARTITIONED BY ALL",
            "context": {"sqlQueryId": "shadow-1"}}""")
      assert(c == 200)
      val fin = awaitTerminal(port, "shadow-1")
      assert(fin.path("state").asText() == "FAILED", fin.toString)
      assert(fin.path("errorDetails").path("errorMessage").asText()
        .contains("shadow"))
      // the view still serves its original rows
      val (c2, b2) = postTo(port, "/druid/v2/sql",
        """{"query": "SELECT count(*) AS c FROM events"}""")
      assert(c2 == 200 && mapper.readTree(b2).get(0).path("c").asLong() == 5L)
    }
  }

  test("statements API: read-only broker rejects ingestion") {
    withStatementServer(pageRows = 100) { port =>
      val (code, body) = postTo(port, "/druid/v2/sql/statements",
        """{"query": "INSERT INTO t SELECT * FROM events PARTITIONED BY DAY"}""")
      assert(code == 400 && body.contains("read-only"), body)
    }
  }

  test("statements API restart contract: SUCCESS envelopes journal, " +
       "non-SUCCESS ids are process-scoped, ingested data is durable") {
    // SUCCESS statements journal their terminal envelope (schema, page
    // contents, result summary) under ingestRoot/.statements, so a
    // restarted broker still answers status AND paged results for
    // them. Everything else (RUNNING / FAILED / CANCELED) stays
    // per-process — 404 after restart (real Druid's durable-task path
    // is the MSQ/Overlord surface, a documented non-goal).
    val root = java.nio.file.Files.createTempDirectory("graft-restart")
      .toString
    def boot(): com.sun.net.httpserver.HttpServer =
      DruidServe.start(spark, _ => events, port = 0,
        sqlTables = Map("events" -> events),
        threads = 4, ingestRoot = Some(root))
    val first = boot()
    var preResults: String = null
    try {
      val p1 = first.getAddress.getPort
      val (c, body) = postTo(p1, "/druid/v2/sql/statements",
        """{"query": "INSERT INTO durable SELECT __time, event_type, user_id, value FROM events PARTITIONED BY DAY",
            "context": {"sqlQueryId": "dur-1"}}""")
      assert(c == 200, body)
      val fin = awaitTerminal(p1, "dur-1")
      assert(fin.path("state").asText() == "SUCCESS", fin.toString)
      assert(sendTo(p1, "GET", "/druid/v2/sql/statements/dur-1")._1 == 200)
      // a SELECT statement whose results must survive the restart
      val (cs, _) = postTo(p1, "/druid/v2/sql/statements",
        """{"query": "SELECT event_type, count(*) AS n FROM events GROUP BY event_type ORDER BY event_type",
            "context": {"sqlQueryId": "dur-sel"}}""")
      assert(cs == 200)
      assert(awaitTerminal(p1, "dur-sel").path("state").asText() == "SUCCESS")
      preResults = sendTo(p1, "GET",
        "/druid/v2/sql/statements/dur-sel/results")._2
      // and a FAILED statement, which must NOT survive
      val (cf, _) = postTo(p1, "/druid/v2/sql/statements",
        """{"query": "SELECT no_such_col FROM events",
            "context": {"sqlQueryId": "dur-bad"}}""")
      assert(cf == 200)
      assert(awaitTerminal(p1, "dur-bad").path("state").asText() == "FAILED")
    } finally first.stop(0)
    val second = boot()
    try {
      val p2 = second.getAddress.getPort
      // journaled SUCCESS envelopes answer on both endpoints
      val (cj, bj) = sendTo(p2, "GET", "/druid/v2/sql/statements/dur-sel")
      assert(cj == 200, bj)
      val env = mapper.readTree(bj)
      assert(env.path("state").asText() == "SUCCESS")
      assert(env.path("result").path("numTotalRows").asLong() > 0)
      assert(env.path("schema").size() == 2, bj)
      val (cr, br) = sendTo(p2, "GET",
        "/druid/v2/sql/statements/dur-sel/results")
      assert(cr == 200 && br == preResults,
        s"journaled results differ:\n$br\nvs\n$preResults")
      // page index works over the journaled pages
      assert(sendTo(p2, "GET",
        "/druid/v2/sql/statements/dur-sel/results?page=0")._1 == 200)
      // the SUCCESS ingest statement is journaled too
      assert(sendTo(p2, "GET", "/druid/v2/sql/statements/dur-1")._1 == 200)
      // the FAILED statement stayed per-process
      assert(sendTo(p2, "GET", "/druid/v2/sql/statements/dur-bad")._1 == 404)
      assert(sendTo(p2, "GET",
        "/druid/v2/sql/statements/dur-bad/results")._1 == 404)
      // unknown ids still 404
      assert(sendTo(p2, "GET", "/druid/v2/sql/statements/nope")._1 == 404)
      // the committed data survives: same ingestRoot, full row count
      val (c2, b2) = postTo(p2, "/druid/v2/sql",
        """{"query": "SELECT count(*) AS c FROM durable"}""")
      assert(c2 == 200, b2)
      assert(mapper.readTree(b2).get(0).path("c").asLong() == 5L)
      // and the restarted coordinator lists it
      val (c3, b3) = sendTo(p2, "GET", "/druid/v2/datasources")
      assert(c3 == 200 && b3.contains("durable"), b3)
    } finally second.stop(0)
  }

  test("coordinator datasource metadata answers names and segment stats") {
    withIngestServer { (port, _) =>
      val (ci, _) = postTo(port, "/druid/v2/sql/statements",
        """{"query": "INSERT INTO coord SELECT __time, event_type, user_id, value FROM events PARTITIONED BY DAY",
            "context": {"sqlQueryId": "coord-ing"}}""")
      assert(ci == 200)
      assert(awaitTerminal(port, "coord-ing").path("state").asText() == "SUCCESS")
      // both coordinator routes list every served datasource
      Seq("/druid/coordinator/v1/datasources",
          "/druid/coordinator/v1/metadata/datasources").foreach { base =>
        val (c, b) = sendTo(port, "GET", base)
        assert(c == 200 && b.contains("coord") && b.contains("events"), b)
      }
      // segment-backed datasource: real stats
      val (c2, b2) = sendTo(port, "GET",
        "/druid/coordinator/v1/datasources/coord")
      assert(c2 == 200, b2)
      val seg = mapper.readTree(b2).path("segments")
      assert(seg.path("count").asInt() >= 3) // 5 events over 3 days
      assert(seg.path("rows").asLong() == 5L)
      assert(seg.path("size").asLong() > 0L)
      assert(seg.path("minTime").asText().startsWith("2024-01-01"))
      assert(seg.path("maxTime").asText().startsWith("2024-01-0"))
      // in-memory served view: listed, zero segment stats
      val (c3, b3) = sendTo(port, "GET",
        "/druid/coordinator/v1/datasources/events")
      assert(c3 == 200 &&
        mapper.readTree(b3).path("segments").path("count").asInt() == 0)
      // unknown datasource is a 404
      assert(sendTo(port, "GET",
        "/druid/coordinator/v1/datasources/nope")._1 == 404)
    }
  }

  test("auto-compaction merges undersized ingested segments, data intact") {
    val root = java.nio.file.Files.createTempDirectory("graft-autocomp").toString
    val server = DruidServe.start(spark, _ => events, port = 0,
      sqlTables = Map("events" -> events), threads = 4,
      ingestRoot = Some(root), autoCompactSeconds = Some(1L),
      compactTargetRows = 1000L)
    val port = server.getAddress.getPort
    try {
      // three small INSERTs -> three undersized segments
      (1 to 3).foreach { i =>
        val (c, _) = postTo(port, "/druid/v2/sql/statements",
          s"""{"query": "INSERT INTO ac SELECT __time, event_type, user_id, value FROM events PARTITIONED BY ALL",
               "context": {"sqlQueryId": "ac-$i"}}""")
        assert(c == 200)
        assert(awaitTerminal(port, s"ac-$i").path("state").asText() == "SUCCESS")
      }
      def segCount: Int = mapper.readTree(sendTo(port, "GET",
          "/druid/coordinator/v1/datasources/ac")._2)
        .path("segments").path("count").asInt()
      assert(segCount >= 3)
      // the 1-second compactor merges them into one full segment
      val deadline = System.nanoTime() + 30L * 1000000000L
      while (segCount > 1 && System.nanoTime() < deadline) Thread.sleep(250)
      assert(segCount == 1, s"auto-compaction did not converge: $segCount")
      // data survives the swap and stays queryable
      val (c2, b2) = postTo(port, "/druid/v2/sql",
        """{"query": "SELECT count(*) AS c, sum(user_id) AS u FROM ac"}""")
      val row = mapper.readTree(b2).get(0)
      assert(c2 == 200 && row.path("c").asLong() == 15L
        && row.path("u").asLong() == 27L, b2)
    } finally server.stop(0)
  }

  test("coordinator DELETE drops intervals and whole datasources") {
    withIngestServer { (port, root) =>
      val (ci, _) = postTo(port, "/druid/v2/sql/statements",
        """{"query": "INSERT INTO dropme SELECT __time, event_type, user_id, value FROM events PARTITIONED BY DAY",
            "context": {"sqlQueryId": "drop-ing"}}""")
      assert(ci == 200)
      assert(awaitTerminal(port, "drop-ing").path("state").asText() == "SUCCESS")
      // drop one day (2024-01-02: two rows)
      val (c1, b1) = sendTo(port, "DELETE",
        "/druid/coordinator/v1/datasources/dropme/intervals/" +
          "2024-01-02T00:00:00Z_2024-01-03T00:00:00Z")
      assert(c1 == 200, b1)
      val r1 = mapper.readTree(b1)
      assert(r1.path("numChangedSegments").asInt() >= 1)
      assert(r1.path("rowsDropped").asLong() == 2L)
      val (c2, b2) = postTo(port, "/druid/v2/sql",
        """{"query": "SELECT count(*) AS c FROM dropme"}""")
      assert(c2 == 200 && mapper.readTree(b2).get(0).path("c").asLong() == 3L)
      // whole-datasource drop removes it from every surface
      val (c3, b3) = sendTo(port, "DELETE",
        "/druid/coordinator/v1/datasources/dropme")
      assert(c3 == 200 && mapper.readTree(b3).path("segmentsKept").asInt() == 0, b3)
      assert(sendTo(port, "GET",
        "/druid/coordinator/v1/datasources/dropme")._1 == 404)
      val (c4, b4) = postTo(port, "/druid/v2/sql",
        """{"query": "SELECT count(*) AS c FROM dropme"}""")
      assert(c4 == 400, b4) // unknown table again
      // guards: unknown ds 404, metadata route stays read-only,
      // non-backed view 400, malformed interval 400
      assert(sendTo(port, "DELETE",
        "/druid/coordinator/v1/datasources/nope")._1 == 404)
      assert(sendTo(port, "DELETE",
        "/druid/coordinator/v1/metadata/datasources/events")._1 == 405)
      assert(sendTo(port, "DELETE",
        "/druid/coordinator/v1/datasources/events")._1 == 400)
      // ingested names are reusable after a whole-table drop
      val (c5, _) = postTo(port, "/druid/v2/sql/statements",
        """{"query": "INSERT INTO dropme SELECT __time, event_type, user_id, value FROM events WHERE event_type = 'view' PARTITIONED BY ALL",
            "context": {"sqlQueryId": "drop-re"}}""")
      assert(c5 == 200)
      assert(awaitTerminal(port, "drop-re").path("state").asText() == "SUCCESS")
      val (c6, b6) = postTo(port, "/druid/v2/sql",
        """{"query": "SELECT count(*) AS c FROM dropme"}""")
      assert(c6 == 200 && mapper.readTree(b6).get(0).path("c").asLong() == 2L)
      // kill=true (Druid's kill task): drop marks unused AND physically
      // reclaims every tombstoned segment of the datasource — including
      // the generations the earlier graceful drops left in trash
      val (c7, b7) = sendTo(port, "DELETE",
        "/druid/coordinator/v1/datasources/dropme?kill=true")
      assert(c7 == 200, b7)
      val r7 = mapper.readTree(b7)
      assert(r7.path("numChangedSegments").asInt() >= 1, b7)
      assert(r7.path("segmentsKilled").asInt() >= 2, b7)
      val left = Option(new java.io.File(s"$root/dropme").listFiles())
        .getOrElse(Array.empty)
      assert(!left.exists(f => f.isDirectory &&
        graft.format.DruidSegment.isSegmentDir(f.toPath)),
        left.map(_.getName).mkString(","))
    }
  }

  test("read-only broker refuses coordinator drops") {
    withStatementServer(pageRows = 100) { port =>
      val (c, b) = sendTo(port, "DELETE",
        "/druid/coordinator/v1/datasources/events")
      assert(c == 400 && b.contains("read-only"), b)
    }
  }

  test("ingestion schema evolution: INSERT with a new column widens the table") {
    withIngestServer { (port, _) =>
      val (c1, _) = postTo(port, "/druid/v2/sql/statements",
        """{"query": "INSERT INTO evo SELECT __time, event_type, user_id, value FROM events WHERE event_type = 'click' PARTITIONED BY ALL",
            "context": {"sqlQueryId": "evo-1"}}""")
      assert(c1 == 200)
      assert(awaitTerminal(port, "evo-1").path("state").asText() == "SUCCESS")
      // second INSERT carries an extra column the first batch lacked
      val (c2, _) = postTo(port, "/druid/v2/sql/statements",
        """{"query": "INSERT INTO evo SELECT __time, event_type, user_id, value, 'b2' AS batch FROM events WHERE event_type = 'view' PARTITIONED BY ALL",
            "context": {"sqlQueryId": "evo-2"}}""")
      assert(c2 == 200)
      val fin = awaitTerminal(port, "evo-2")
      assert(fin.path("state").asText() == "SUCCESS", fin.toString)
      // the union schema serves: old rows answer NULL for the new column
      val (c3, b3) = postTo(port, "/druid/v2/sql",
        """{"query": "SELECT count(*) AS n, sum(CASE WHEN batch IS NULL THEN 1 ELSE 0 END) AS oldrows FROM evo"}""")
      assert(c3 == 200, b3)
      val row = mapper.readTree(b3).get(0)
      assert(row.path("n").asLong() == 5L && row.path("oldrows").asLong() == 3L, b3)
    }
  }

  test("/status/health and coordinator interval listing") {
    withIngestServer { (port, _) =>
      assert(sendTo(port, "GET", "/status/health") == (200, "true"))
      val (ci, _) = postTo(port, "/druid/v2/sql/statements",
        """{"query": "INSERT INTO iv SELECT __time, event_type, user_id, value FROM events PARTITIONED BY DAY",
            "context": {"sqlQueryId": "iv-ing"}}""")
      assert(ci == 200)
      assert(awaitTerminal(port, "iv-ing").path("state").asText() == "SUCCESS")
      val (c2, b2) = sendTo(port, "GET",
        "/druid/coordinator/v1/datasources/iv/intervals")
      assert(c2 == 200, b2)
      val arr = mapper.readTree(b2)
      // EXACT data intervals (the catalog's tighter-than-bucket
      // planning metadata), descending, lo/hi ISO strings
      assert(arr.size() > 0, b2)
      val ivs = (0 until arr.size()).map(arr.get(_).asText())
      assert(ivs.forall(_.matches(
        "2024-01-0\\d{1}T.*Z/2024-01-0\\d{1}T.*Z")), ivs)
      assert(ivs == ivs.sortBy(identity).reverse, s"not descending: $ivs")
      assert(ivs.head.startsWith("2024-01-03") &&
        ivs.last.startsWith("2024-01-01"))
      // unknown sub-paths are 404, not stats
      assert(sendTo(port, "GET",
        "/druid/coordinator/v1/datasources/iv/bogus")._1 == 404)
    }
  }
}

object DruidServeSpec {
  /** Latch the retirement spec's gated UDF blocks on (static so the
    * task closure can reach it in local mode).
    */
  @volatile var retireGate: java.util.concurrent.CountDownLatch = _
}
