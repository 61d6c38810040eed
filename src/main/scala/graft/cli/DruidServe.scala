package graft.cli

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** `druid-tool serve` — a minimal HTTP endpoint speaking Druid's
  * native-query WIRE PROTOCOL (`POST /druid/v2`, the broker endpoint
  * every Druid client library and dashboard targets; the reference is
  * a CLI-only SQL bridge, src/main.rs:65). Query JSON compiles through
  * [[graft.query.NativeQuery]] into a declarative Spark plan; the
  * server only shapes the result rows into Druid's per-query-type
  * response envelopes:
  *
  *  - timeseries: `[{"timestamp": iso, "result": {agg: value, ...}}]`
  *  - groupBy: `[{"version": "v1", "timestamp": iso|null,
  *    "event": {dim/agg: value, ...}}]`
  *  - topN: `[{"timestamp": iso|null, "result": [{...}, ...]}]`
  *  - scan: `[{"segmentId": null, "columns": [...], "events": ...}]`
  *    honoring `resultFormat` "list" (objects, default) and
  *    "compactedList" (positional arrays) — one batch
  *  - everything else (search/timeBoundary/metadata): a plain JSON
  *    array of column->value objects
  *
  * `POST /druid/v2/sql` accepts Druid SQL (`{"query": "..."}`) — the
  * endpoint most modern Druid clients use — running through Spark SQL
  * with the Druid SQL compat layer registered (EARLIEST/LATEST,
  * APPROX_COUNT_DISTINCT_DS_HLL, LOOKUP, TIME_*, MV_*, ...), answering
  * the default `resultFormat: "object"` array.
  *
  * `GET /status` answers like a broker so client health checks pass.
  * The server executor is the JDK default (one request at a time);
  * parallelism lives inside Spark, where it belongs.
  */
object DruidServe {

  private val mapper = new ObjectMapper()
  private val isoMs = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
    .withZone(ZoneOffset.UTC)

  /** Start serving; `resolve` maps a dataSource name to its DataFrame
    * (native queries), `sqlTables` names the tables the SQL endpoint
    * exposes as temp views. Port 0 binds an ephemeral port (see
    * `server.getAddress.getPort`). Caller stops the returned server.
    */
  def start(spark: SparkSession, resolve: String => DataFrame,
            port: Int,
            sqlTables: Map[String, DataFrame] = Map.empty): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    def handled(ex: HttpExchange)(body: String => String): Unit =
      try {
        if (ex.getRequestMethod != "POST")
          respond(ex, 405, """{"error":"queries are POSTed"}""")
        else respond(ex, 200,
          body(new String(ex.getRequestBody.readAllBytes(), UTF_8)))
      } catch {
        case e: Throwable =>
          val o = mapper.createObjectNode()
          o.put("error", "Query not supported")
          o.put("errorMessage", String.valueOf(e.getMessage))
          o.put("errorClass", e.getClass.getName)
          respond(ex, 400, o.toString)
      }
    server.createContext("/status", (ex: HttpExchange) =>
      respond(ex, 200, """{"service":"graft/broker","version":"graft-1"}"""))
    // ORDER MATTERS for the JDK server: the longest matching context
    // prefix wins, so /druid/v2/sql takes SQL and /druid/v2 native JSON
    server.createContext("/druid/v2", (ex: HttpExchange) =>
      handled(ex) { body =>
        val q = mapper.readTree(body)
        envelope(q, graft.query.NativeQuery.run(body, resolve))
      })
    server.createContext("/druid/v2/sql", (ex: HttpExchange) =>
      handled(ex) { body =>
        val node = mapper.readTree(body)
        val sql = node.path("query").asText()
        if (sql.isEmpty)
          throw new IllegalArgumentException("SQL endpoint needs {\"query\": ...}")
        graft.sql.DruidSqlCompat.register(spark)
        sqlTables.foreach { case (n, df) => df.createOrReplaceTempView(n) }
        val df = spark.sql(sql)
        val out = mapper.createArrayNode()
        val schema = df.schema
        df.collect().foreach(r => fill(out.addObject(), r, schema,
          skipTime = false))
        out.toString
      })
    server.start()
    server
  }

  /** `druid-tool`-style entry: serve every segment table under `root`
    * (dataSource name = subdirectory name).
    */
  def main(args: Array[String]): Unit = args.toList match {
    case root :: rest =>
      val port = rest match {
        case "--port" :: p :: Nil => p.toInt
        case Nil => 8082
        case other => sys.error(s"unknown args: $other")
      }
      val spark = SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
        .appName("druid-serve")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val tables = Option(new java.io.File(root).listFiles())
        .getOrElse(Array.empty).filter(_.isDirectory)
        .map(_.getName).filterNot(_.startsWith("."))
        .map(n => n -> spark.read.format("druid").load(s"$root/$n")).toMap
      // resolve ONLY from the discovered set: raw path concatenation
      // would let a remote dataSource name ("../../...") traverse to
      // any readable directory, and reusing the prebuilt frames skips
      // re-discovering segments on every request
      val server = start(spark,
        name => tables.getOrElse(name, throw new IllegalArgumentException(
          s"unknown dataSource '$name' (tables: ${tables.keys.toSeq.sorted.mkString(", ")})")),
        port, sqlTables = tables)
      println(s"druid-serve listening on :${server.getAddress.getPort} " +
        s"(POST /druid/v2 native, /druid/v2/sql), tables under $root")
      Thread.currentThread().join()
    case Nil =>
      System.err.println("usage: druid-serve <tablesRoot> [--port N]")
      sys.exit(2)
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    try ex.getResponseBody.write(bytes) finally ex.close()
  }

  // ---- result envelopes ---------------------------------------------------

  private def envelope(q: com.fasterxml.jackson.databind.JsonNode,
                       df: DataFrame): String = {
    val queryType = q.path("queryType").asText()
    val schema = df.schema
    val rows = df.collect()
    val timeIdx = schema.fieldNames.indexOf("__time")
    def timestampOf(r: Row): Option[String] =
      if (timeIdx < 0 || r.isNullAt(timeIdx)) None
      else Some(isoMs.format(r.getTimestamp(timeIdx).toInstant))
    val out: ArrayNode = mapper.createArrayNode()
    queryType match {
      case "timeseries" =>
        rows.foreach { r =>
          val o = out.addObject()
          timestampOf(r) match {
            case Some(t) => o.put("timestamp", t)
            case None => o.putNull("timestamp")
          }
          fill(o.putObject("result"), r, schema, skipTime = true)
        }
      case "groupBy" =>
        rows.foreach { r =>
          val o = out.addObject()
          o.put("version", "v1")
          timestampOf(r) match {
            case Some(t) => o.put("timestamp", t)
            case None => o.putNull("timestamp")
          }
          fill(o.putObject("event"), r, schema, skipTime = true)
        }
      case "topN" =>
        // exact topN: all rows belong to the single granularity
        // bucket; no rows → empty array like Druid, not a phantom
        // bucket entry
        if (rows.nonEmpty) {
          val o = out.addObject()
          rows.headOption.flatMap(timestampOf) match {
            case Some(t) => o.put("timestamp", t)
            case None => o.putNull("timestamp")
          }
          val res = o.putArray("result")
          rows.foreach(r => fill(res.addObject(), r, schema, skipTime = true))
        }
      case "scan" =>
        // one ScanResultValue batch: columns + events, resultFormat
        // "list" (objects, Druid's default) or "compactedList"
        // (positional arrays)
        val o = out.addObject()
        o.putNull("segmentId")
        val colsArr = o.putArray("columns")
        schema.fieldNames.foreach(colsArr.add)
        val events = o.putArray("events")
        if (q.path("resultFormat").asText("list") == "compactedList")
          rows.foreach { r =>
            val row = events.addArray()
            val one = mapper.createObjectNode()
            fill(one, r, schema, skipTime = false)
            schema.fieldNames.foreach(n => row.add(one.get(n)))
          }
        else
          rows.foreach(r => fill(events.addObject(), r, schema,
            skipTime = false))
      case _ =>
        rows.foreach(r => fill(out.addObject(), r, schema, skipTime = false))
    }
    out.toString
  }

  private def fill(o: ObjectNode, r: Row, schema: StructType,
                   skipTime: Boolean): Unit =
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (!(skipTime && f.name == "__time")) {
        if (r.isNullAt(i)) o.putNull(f.name)
        else f.dataType match {
          case LongType => o.put(f.name, r.getLong(i))
          case IntegerType => o.put(f.name, r.getInt(i))
          case DoubleType => o.put(f.name, r.getDouble(i))
          case FloatType => o.put(f.name, r.getFloat(i))
          case BooleanType => o.put(f.name, r.getBoolean(i))
          case StringType => o.put(f.name, r.getString(i))
          case TimestampType =>
            o.put(f.name, isoMs.format(r.getTimestamp(i).toInstant))
          case BinaryType => // mergeable sketch blobs etc. — base64, like Druid
            o.put(f.name, java.util.Base64.getEncoder
              .encodeToString(r.getAs[Array[Byte]](i)))
          case ArrayType(StringType, _) =>
            val a = o.putArray(f.name)
            r.getSeq[String](i).foreach(v =>
              if (v == null) a.addNull() else a.add(v))
          case other => o.put(f.name, String.valueOf(r.get(i)))
        }
      }
    }
}
