package graft.sql

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Druid MSQ's `TABLE(EXTERN(inputSource, inputFormat, signature))`:
  * the rewrite compiles local/inline sources in json/csv/tsv/parquet
  * formats to spark.read temp views; ad-hoc SELECTs and SQL ingestion
  * both accept the wire shape. Literal-awareness and loud failure
  * modes pinned here too.
  */
class ExternSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  private val mapper = new ObjectMapper()

  private def q(s: String) = s.replace("'", "''")

  test("inline json EXTERN answers a plain SELECT") {
    val sql = """SELECT name, sum(x) AS sx
                 FROM TABLE(EXTERN(
                   '{"type":"inline","data":"{\"name\":\"a\",\"x\":1}\n{\"name\":\"b\",\"x\":2}\n{\"name\":\"a\",\"x\":3}"}',
                   '{"type":"json"}',
                   '[{"name":"name","type":"string"},{"name":"x","type":"long"}]'))
                 GROUP BY 1 ORDER BY 1"""
    val rows = spark.sql(Extern.rewrite(spark, sql)).collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 4L), ("b", 2L)))
  }

  test("inline csv with findColumnsFromHeader and tsv with explicit delimiter") {
    val csv = """SELECT count(*) AS n, sum(v) AS s FROM TABLE(EXTERN(
        '{"type":"inline","data":"k,v\na,1\nb,2"}',
        '{"type":"csv","findColumnsFromHeader":true}',
        '[{"name":"k","type":"string"},{"name":"v","type":"long"}]'))"""
    val r1 = spark.sql(Extern.rewrite(spark, csv)).collect().head
    assert(r1.getLong(0) == 2L && r1.getLong(1) == 3L)
    val tsv = """SELECT sum(v) AS s FROM TABLE(EXTERN(
        '{"type":"inline","data":"x\t5\ny\t7"}',
        '{"type":"tsv"}',
        '[{"name":"k","type":"string"},{"name":"v","type":"long"}]'))"""
    assert(spark.sql(Extern.rewrite(spark, tsv)).collect().head.getLong(0) == 12L)
  }

  test("local json files and parquet (signature projects + casts)") {
    val dir = Files.createTempDirectory("extern_local")
    val f = dir.resolve("part1.json")
    Files.write(f, "{\"a\": 1, \"b\": \"x\"}\n{\"a\": 2, \"b\": \"y\"}\n"
      .getBytes("UTF-8"))
    val sql = s"""SELECT sum(a) AS s FROM TABLE(EXTERN(
        '{"type":"local","baseDir":"${q(dir.toString)}","filter":"*.json"}',
        '{"type":"json"}',
        '[{"name":"a","type":"long"},{"name":"b","type":"string"}]'))"""
    assert(spark.sql(Extern.rewrite(spark, sql)).collect().head.getLong(0) == 3L)

    import spark.implicits._
    val pdir = dir.resolve("pq").toString
    Seq((1L, 2.5, "zz"), (4L, 0.5, "ww")).toDF("a", "d", "extra")
      .write.parquet(pdir)
    val psql = s"""SELECT sum(a) AS sa, round(sum(d), 2) AS sd
        FROM TABLE(EXTERN(
        '{"type":"local","files":["${q(pdir)}"]}',
        '{"type":"parquet"}',
        '[{"name":"a","type":"long"},{"name":"d","type":"double"}]'))"""
    val pr = spark.sql(Extern.rewrite(spark, psql)).collect().head
    assert(pr.getLong(0) == 5L && pr.getDouble(1) == 3.0)
  }

  test("EXTERN text inside a string literal is untouched; failures are loud") {
    val lit = "SELECT 'use TABLE(EXTERN(...)) for ingestion' AS hint"
    assert(Extern.rewrite(spark, lit) == lit)
    val noExtern = "SELECT 1"
    assert(Extern.rewrite(spark, noExtern) eq noExtern)

    def err(sql: String): String =
      intercept[IllegalArgumentException](Extern.rewrite(spark, sql))
        .getMessage
    assert(err("""SELECT * FROM TABLE(EXTERN(
        '{"type":"http","uris":["http://x/y.json"]}',
        '{"type":"json"}', '[{"name":"a","type":"long"}]'))""")
      .contains("unsupported inputSource"))
    assert(err("""SELECT * FROM TABLE(EXTERN(
        '{"type":"inline","data":"{}"}', '{"type":"orc"}',
        '[{"name":"a","type":"long"}]'))""")
      .contains("unsupported inline inputFormat"))
    assert(err("""SELECT * FROM TABLE(EXTERN(
        '{"type":"inline","data":"{}"}', '{"type":"json"}',
        '[{"name":"a","type":"decimal"}]'))""")
      .contains("unsupported column type"))
    assert(err("""SELECT * FROM TABLE(EXTERN('{"type":"inline"}'))""")
      .contains("got 1 arguments"))
    // commented-out EXTERN calls stay text (even syntactically broken
    // ones — a scanner that parses comments would throw on them)
    val lineC = "SELECT 1 -- TABLE(EXTERN('broken\n, 2"
    assert(Extern.rewrite(spark, lineC) == lineC)
    val blockC = "SELECT /* TABLE(EXTERN( */ 1"
    assert(Extern.rewrite(spark, blockC) == blockC)
  }

  test("EXTENDS form (the console's data-loader shape): 2-arg EXTERN + SQL types") {
    val sql = """SELECT name, sum(x) AS sx, round(sum(d), 1) AS sd
                 FROM TABLE(EXTERN(
                   '{"type":"inline","data":"{\"name\":\"a\",\"x\":1,\"d\":0.25}\n{\"name\":\"b\",\"x\":2,\"d\":0.5}\n{\"name\":\"a\",\"x\":3,\"d\":0.25}"}',
                   '{"type":"json"}'
                 )) EXTENDS (name VARCHAR, x BIGINT, "d" DOUBLE)
                 GROUP BY 1 ORDER BY 1"""
    val rows = spark.sql(Extern.rewrite(spark, sql)).collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq(("a", 4L, 0.5), ("b", 2L, 0.5)))
    // loud failures: EXTENDS with 3 args, unsupported EXTENDS type
    def err(sql: String): String =
      intercept[IllegalArgumentException](Extern.rewrite(spark, sql))
        .getMessage
    assert(err("""SELECT * FROM TABLE(EXTERN(
        '{"type":"inline","data":"{}"}', '{"type":"json"}',
        '[{"name":"a","type":"long"}]')) EXTENDS (a BIGINT)""")
      .contains("not both"))
    assert(err("""SELECT * FROM TABLE(EXTERN(
        '{"type":"inline","data":"{}"}', '{"type":"json"}'
        )) EXTENDS (a TIMESTAMP)""")
      .contains("unsupported column type"))
  }

  test("SQL ingestion: INSERT ... FROM TABLE(EXTERN(...)) PARTITIONED BY DAY over HTTP") {
    val root = Files.createTempDirectory("extern_ingest").toString
    val data = Files.createTempDirectory("extern_data")
    val f = data.resolve("events.json")
    // two days of events, millis timestamps
    val lines = (0 until 6).map { i =>
      val ts = 1704067200000L + i * 43200000L // 2024-01-01 + i*12h
      s"""{"t": $ts, "who": "u${i % 2}", "v": ${i * 1.5}}"""
    }
    Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    val server = graft.cli.DruidServe.start(spark,
      n => throw new IllegalArgumentException(s"unknown $n"), port = 0,
      sqlTables = Map.empty, ingestRoot = Some(root))
    try {
      val port = server.getAddress.getPort
      val insert = s"""INSERT INTO ext_events
          SELECT timestamp_millis(t) AS __time, who, v
          FROM TABLE(EXTERN(
            '{"type":"local","files":["${q(f.toString)}"]}',
            '{"type":"json"}',
            '[{"name":"t","type":"long"},{"name":"who","type":"string"},{"name":"v","type":"double"}]'))
          PARTITIONED BY DAY"""
      val client = HttpClient.newHttpClient()
      val body = mapper.createObjectNode()
      body.put("query", insert)
      val sr = client.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$port/druid/v2/sql/statements"))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(
          mapper.writeValueAsString(body))).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(sr.statusCode() == 200 || sr.statusCode() == 202, sr.body())
      val qid = mapper.readTree(sr.body()).path("queryId").asText()
      var state = ""
      var tries = 0
      while (state != "SUCCESS" && state != "FAILED" && tries < 200) {
        val st = client.send(HttpRequest.newBuilder(URI.create(
            s"http://127.0.0.1:$port/druid/v2/sql/statements/$qid"))
          .GET().build(), HttpResponse.BodyHandlers.ofString())
        state = mapper.readTree(st.body()).path("state").asText()
        if (state != "SUCCESS" && state != "FAILED") Thread.sleep(50)
        tries += 1
      }
      assert(state == "SUCCESS")
      // the ingested table answers queries; DAY granularity produced
      // interval-aligned segments
      val qr = client.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$port/druid/v2/sql"))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(
          """{"query": "SELECT who, count(*) AS n, round(sum(v), 1) AS s FROM ext_events GROUP BY 1 ORDER BY 1"}"""))
        .build(), HttpResponse.BodyHandlers.ofString())
      assert(qr.statusCode() == 200, qr.body())
      val rows = mapper.readTree(qr.body())
      assert(rows.size() == 2, qr.body())
      assert(rows.get(0).path("who").asText() == "u0" &&
        rows.get(0).path("n").asLong() == 3L &&
        rows.get(0).path("s").asDouble() == 9.0)
      assert(rows.get(1).path("who").asText() == "u1" &&
        rows.get(1).path("n").asLong() == 3L &&
        rows.get(1).path("s").asDouble() == 13.5)
      val segs = graft.sources.druid.SegmentCatalog.metaFor(s"$root/ext_events")
      assert(segs.length >= 3, s"DAY granularity should split days: $segs")
    } finally server.stop(0)
  }
}
