package graft.cli

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Broker result cache (Druid's useCache/populateCache context flags):
  * identical native queries hit; any table-generation change (segment
  * commit, view re-registration, lookup edit) changes the epoch and
  * forces a recompute — a hit can never serve a previous generation.
  */
class ResultCacheSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  private val mapper = new ObjectMapper()

  private def post(port: Int, json: String)
      : (Int, String, Option[String], Option[String]) = {
    val client = HttpClient.newHttpClient()
    val req = HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port/druid/v2"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(json)).build()
    val r = client.send(req, HttpResponse.BodyHandlers.ofString())
    def h(k: String) = {
      val v = r.headers().firstValue(k)
      if (v.isPresent) Some(v.get) else None
    }
    (r.statusCode(), r.body(), h("X-Graft-Cache"), h("X-Druid-Response-Context"))
  }

  private def segTable(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-cache").toString + "/t"
    (0 until 100).map(i => (1700000000000L + i * 1000L, s"e${i % 3}", i.toLong))
      .toDF("__time", "event_type", "n")
      .write.format("druid").mode("overwrite").save(dir)
    dir
  }

  private val q =
    """{"queryType": "timeseries", "dataSource": "ev",
        "granularity": "all",
        "aggregations": [{"type": "count", "name": "n"}]%s}"""
  private def query(ctx: String = "") = q.format(
    if (ctx.isEmpty) "" else s""", "context": {$ctx}""")

  test("identical queries hit; queryId does not split the key; hit serves the same body") {
    val dir = segTable()
    val ev = spark.read.format("druid").load(dir)
    val server = DruidServe.start(spark, _ => ev, port = 0,
      sqlTables = Map("ev" -> ev))
    try {
      val port = server.getAddress.getPort
      val (c1, b1, h1, _) = post(port, query())
      assert(c1 == 200 && h1.contains("MISS"), s"$c1 $b1 $h1")
      val (c2, b2, h2, rc2) = post(port, query(""""queryId": "other-id""""))
      assert(c2 == 200 && h2.contains("HIT"), s"second call: $h2")
      assert(b1 == b2, "hit must serve the identical body")
      assert(rc2.exists(_.contains("\"cached\":true")), s"context: $rc2")
    } finally server.stop(0)
  }

  test("useCache:false recomputes; populateCache:false keeps results out") {
    val dir = segTable()
    val ev = spark.read.format("druid").load(dir)
    val server = DruidServe.start(spark, _ => ev, port = 0,
      sqlTables = Map("ev" -> ev))
    try {
      val port = server.getAddress.getPort
      // populateCache:false -> stays cold
      val (_, _, ha, _) = post(port, query(""""populateCache": false"""))
      val (_, _, hb, _) = post(port, query())
      assert(ha.contains("MISS") && hb.contains("MISS"),
        s"populateCache:false leaked into the cache: $ha $hb")
      // now populated; useCache:false must still recompute
      val (_, _, hc, _) = post(port, query(""""useCache": false"""))
      assert(hc.contains("MISS"), s"useCache:false served a hit: $hc")
      // and the plain query hits what the populate run stored
      val (_, _, hd, _) = post(port, query())
      assert(hd.contains("HIT"), s"expected warm hit: $hd")
    } finally server.stop(0)
  }

  test("a segment commit changes the epoch: no hit across table generations") {
    import spark.implicits._
    val dir = segTable()
    val ev = spark.read.format("druid").load(dir)
    val server = DruidServe.start(spark, _ => ev, port = 0,
      sqlTables = Map("ev" -> ev))
    try {
      val port = server.getAddress.getPort
      val (_, b1, h1, _) = post(port, query())
      val (_, _, h2, _) = post(port, query())
      assert(h1.contains("MISS") && h2.contains("HIT"))
      // append through the writer: the catalog fingerprint changes
      (0 until 50).map(i => (1700010000000L + i * 1000L, "e9", i.toLong))
        .toDF("__time", "event_type", "n")
        .write.format("druid").mode("append").save(dir)
      val (_, b3, h3, _) = post(port, query())
      assert(h3.contains("MISS"), s"stale hit across generations: $h3")
      val n1 = mapper.readTree(b1).get(0).path("result").path("n").asLong()
      val n3 = mapper.readTree(b3).get(0).path("result").path("n").asLong()
      assert(n1 == 100L && n3 == 150L, s"counts: $n1 -> $n3")
    } finally server.stop(0)
  }

  private def postSql(port: Int, json: String)
      : (Int, String, Option[String]) = {
    val client = HttpClient.newHttpClient()
    val req = HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$port/druid/v2/sql"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(json)).build()
    val r = client.send(req, HttpResponse.BodyHandlers.ofString())
    val v = r.headers().firstValue("X-Graft-Cache")
    (r.statusCode(), r.body(), if (v.isPresent) Some(v.get) else None)
  }

  test("SQL result-level cache: opt-in only, epoch-guarded") {
    import spark.implicits._
    val dir = segTable()
    val ev = spark.read.format("druid").load(dir)
    val server = DruidServe.start(spark, _ => ev, port = 0,
      sqlTables = Map("ev" -> ev))
    try {
      val port = server.getAddress.getPort
      val plain = """{"query": "SELECT count(*) AS n FROM ev"}"""
      val optIn = """{"query": "SELECT count(*) AS n FROM ev",
        "context": {"useResultLevelCache": true}}"""
      // default off, like Druid's broker config: no cache header at all
      val (_, _, h0) = postSql(port, plain)
      assert(h0.isEmpty, s"uninvolved request must not carry the header: $h0")
      val (_, b1, h1) = postSql(port, optIn)
      val (_, b2, h2) = postSql(port, optIn)
      assert(h1.contains("MISS") && h2.contains("HIT"), s"$h1 $h2")
      assert(b1 == b2)
      // a commit crosses the generation: recompute with the new count
      (0 until 10).map(i => (1700020000000L + i * 1000L, "e9", i.toLong))
        .toDF("__time", "event_type", "n")
        .write.format("druid").mode("append").save(dir)
      val (_, b3, h3) = postSql(port, optIn)
      assert(h3.contains("MISS"), s"stale SQL hit: $h3")
      assert(b1.contains("100") && b3.contains("110"), s"$b1 -> $b3")
    } finally server.stop(0)
  }

  test("a commit to an UNRELATED table does not invalidate (scoped epoch)") {
    import spark.implicits._
    val dir = segTable()
    val dir2 = segTable()
    val ev = spark.read.format("druid").load(dir)
    val other = spark.read.format("druid").load(dir2)
    val server = DruidServe.start(spark, _ => ev, port = 0,
      sqlTables = Map("ev" -> ev, "other_tbl" -> other))
    try {
      val port = server.getAddress.getPort
      post(port, query())
      val (_, _, h2, _) = post(port, query())
      assert(h2.contains("HIT"))
      // commit to other_tbl: ev's cached answer is still valid
      (0 until 5).map(i => (1700030000000L + i, "x", i.toLong))
        .toDF("__time", "event_type", "n")
        .write.format("druid").mode("append").save(dir2)
      val (_, _, h3, _) = post(port, query())
      assert(h3.contains("HIT"),
        s"unrelated commit invalidated a scoped entry: $h3")
      // ...while a query OVER other_tbl sees the new generation
      val qOther = q.format("").replace("\"ev\"", "\"other_tbl\"")
      val (_, bo, _, _) = post(port, qOther)
      assert(mapper.readTree(bo).get(0).path("result").path("n")
        .asLong() == 105L)
    } finally server.stop(0)
  }

  test("derived served frame (filter over a druid table) still tracks commits") {
    import spark.implicits._
    val dir = segTable()
    // NOT a bare relation: the served frame projects+filters the table.
    // The epoch must come from the underlying segment catalog anyway.
    val ev = spark.read.format("druid").load(dir)
      .filter(col("n") >= 0L).select("__time", "event_type", "n")
    val server = DruidServe.start(spark, _ => ev, port = 0,
      sqlTables = Map("ev" -> ev))
    try {
      val port = server.getAddress.getPort
      val (_, b1, h1, _) = post(port, query())
      val (_, _, h2, _) = post(port, query())
      assert(h1.contains("MISS") && h2.contains("HIT"))
      (0 until 25).map(i => (1700040000000L + i * 1000L, "e9", i.toLong))
        .toDF("__time", "event_type", "n")
        .write.format("druid").mode("append").save(dir)
      val (_, b3, h3, _) = post(port, query())
      assert(h3.contains("MISS"),
        s"derived frame served a stale generation: $h3")
      val n1 = mapper.readTree(b1).get(0).path("result").path("n").asLong()
      val n3 = mapper.readTree(b3).get(0).path("result").path("n").asLong()
      assert(n1 == 100L && n3 == 125L, s"counts: $n1 -> $n3")
    } finally server.stop(0)
  }

  test("scan resultFormat is part of the key: no cross-envelope hits") {
    val dir = segTable()
    val ev = spark.read.format("druid").load(dir)
    val server = DruidServe.start(spark, _ => ev, port = 0,
      sqlTables = Map("ev" -> ev))
    try {
      val port = server.getAddress.getPort
      def scan(fmt: String) =
        s"""{"queryType": "scan", "dataSource": "ev", "columns": ["n"],
             "limit": 3, "resultFormat": "$fmt"}"""
      val (_, b1, h1, _) = post(port, scan("compactedList"))
      val (_, b2, h2, _) = post(port, scan("list"))
      assert(h1.contains("MISS") && h2.contains("MISS"),
        s"different resultFormat served from one entry: $h1 $h2")
      assert(b1 != b2, "envelopes must differ between formats")
      // and each format hits its own entry
      val (_, b3, h3, _) = post(port, scan("compactedList"))
      assert(h3.contains("HIT") && b3 == b1)
    } finally server.stop(0)
  }

  test("SQL parameter vectors cannot collide on the cache key") {
    val dir = segTable()
    val ev = spark.read.format("druid").load(dir)
    val server = DruidServe.start(spark, _ => ev, port = 0,
      sqlTables = Map("ev" -> ev))
    try {
      val port = server.getAddress.getPort
      // same SQL text, two parameter vectors whose naive "|"-join is
      // identical ("e0|x" + "e1"  vs  "e0" + "x|e1"): distinct answers,
      // so a key collision would serve the wrong result
      val sql = "SELECT count(*) AS n FROM ev WHERE event_type = ? OR event_type = ?"
      def body(a: String, b: String) =
        s"""{"query": ${mapper.writeValueAsString(sql)},
             "parameters": [
               {"type": "VARCHAR", "value": ${mapper.writeValueAsString(a)}},
               {"type": "VARCHAR", "value": ${mapper.writeValueAsString(b)}}],
             "context": {"useResultLevelCache": true}}"""
      val (_, b1, h1) = postSql(port, body("e0|x", "e1"))
      val (_, b2, h2) = postSql(port, body("e0", "x|e1"))
      assert(h1.contains("MISS") && h2.contains("MISS"),
        s"parameter vectors collided on the cache key: $h1 $h2")
      // e0 matches 34 rows, e1 matches 33 (i%3 over 100); e0|x none
      assert(b1.contains("33") && b2.contains("34"), s"$b1 $b2")
      // identical re-issue hits its own entry with the right value
      val (_, b3, h3) = postSql(port, body("e0|x", "e1"))
      assert(h3.contains("HIT") && b3 == b1)
    } finally server.stop(0)
  }

  test("a lookup edit changes the epoch") {
    val dir = segTable()
    val ev = spark.read.format("druid").load(dir)
    val server = DruidServe.start(spark, _ => ev, port = 0,
      sqlTables = Map("ev" -> ev))
    try {
      val port = server.getAddress.getPort
      post(port, query())
      val (_, _, h2, _) = post(port, query())
      assert(h2.contains("HIT"))
      graft.sql.DruidLookups.register("cache_spec_lk", Map("a" -> "b"))
      try {
        val (_, _, h3, _) = post(port, query())
        assert(h3.contains("MISS"),
          s"lookup edit must invalidate cached answers: $h3")
      } finally graft.sql.DruidLookups.unregister("cache_spec_lk")
    } finally server.stop(0)
  }
}
