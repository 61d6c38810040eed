package graft.cli

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Coordinator retention rules (/druid/coordinator/v1/rules):
  * first-matching-rule-wins evaluation over whole segments, immediate
  * application on POST, persistence + restart reload, _default
  * fallback, and loud rejection of unknown rule types.
  */
class RetentionRulesSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  private val mapper = new ObjectMapper()

  /** One segment per day across `days` days ending today (half-day
    * margin so period cutoffs land mid-gap, never on a boundary).
    */
  private def writeDays(dir: String, days: Int): Unit = {
    import spark.implicits._
    val now = System.currentTimeMillis()
    (0 until days).foreach { d =>
      val ts = new java.sql.Timestamp(now - d * 86400000L - 43200000L)
      Seq((ts, s"day$d", d.toLong)).toDF("__time", "tag", "v")
        .coalesce(1).write.format("druid").mode("append").save(dir)
    }
  }

  private def send(port: Int, method: String, path: String,
                   body: String = ""): (Int, String) = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .header("Content-Type", "application/json")
    val req = (method match {
      case "GET" => b.GET()
      case m     => b.method(m, HttpRequest.BodyPublishers.ofString(body))
    }).build()
    val r = HttpClient.newHttpClient()
      .send(req, HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  test("dropBeforeByPeriod drops old segments on POST; query sees the cut") {
    val root = java.nio.file.Files.createTempDirectory("rules_root").toString
    writeDays(s"$root/ev", 10)
    val server = DruidServe.start(spark,
      n => spark.read.format("druid").load(s"$root/$n"), port = 0,
      sqlTables = Map("ev" -> spark.read.format("druid").load(s"$root/ev")),
      ingestRoot = Some(root))
    try {
      val port = server.getAddress.getPort
      assert(graft.sources.druid.SegmentCatalog.metaFor(s"$root/ev").size == 10)
      // keep the last ~5 days (P5D cutoff lands between day4 and day5)
      val (c, b) = send(port, "POST", "/druid/coordinator/v1/rules/ev",
        """[{"type":"dropBeforeByPeriod","period":"P5D"},
            {"type":"loadForever"}]""")
      assert(c == 200, b)
      val left = graft.sources.druid.SegmentCatalog.metaFor(s"$root/ev")
      assert(left.size == 5, s"expected 5 segments left, got ${left.size}")
      // the served table re-registered: SQL sees only the kept rows
      val (c2, b2) = send(port, "POST", "/druid/v2/sql",
        """{"query": "SELECT count(*) AS n, max(v) AS maxd FROM ev"}""")
      assert(c2 == 200, b2)
      val row = mapper.readTree(b2).get(0)
      assert(row.path("n").asLong() == 5L, b2)
      assert(row.path("maxd").asLong() == 4L, b2) // day0..day4 kept
      // rules persisted; GET echoes
      val (c3, b3) = send(port, "GET", "/druid/coordinator/v1/rules/ev")
      assert(c3 == 200 && b3.contains("dropBeforeByPeriod"))
      assert(java.nio.file.Files.isRegularFile(
        java.nio.file.Paths.get(root, ".rules.json")))
    } finally server.stop(0)
  }

  test("first-match-wins: loadByPeriod above a dropForever keeps the recent tail") {
    val root = java.nio.file.Files.createTempDirectory("rules_fm").toString
    writeDays(s"$root/ev", 8)
    val server = DruidServe.start(spark,
      n => spark.read.format("druid").load(s"$root/$n"), port = 0,
      sqlTables = Map("ev" -> spark.read.format("druid").load(s"$root/ev")),
      ingestRoot = Some(root))
    try {
      val port = server.getAddress.getPort
      val (c, b) = send(port, "POST", "/druid/coordinator/v1/rules/ev",
        """[{"type":"loadByPeriod","period":"P3D"},
            {"type":"dropForever"}]""")
      assert(c == 200, b)
      assert(graft.sources.druid.SegmentCatalog
        .metaFor(s"$root/ev").size == 3)
    } finally server.stop(0)
  }

  test("_default rules apply to every ingest-backed table; unknown types are 400") {
    val root = java.nio.file.Files.createTempDirectory("rules_def").toString
    writeDays(s"$root/a", 4)
    writeDays(s"$root/b", 6)
    val server = DruidServe.start(spark,
      n => spark.read.format("druid").load(s"$root/$n"), port = 0,
      sqlTables = Map(
        "a" -> spark.read.format("druid").load(s"$root/a"),
        "b" -> spark.read.format("druid").load(s"$root/b")),
      ingestRoot = Some(root))
    try {
      val port = server.getAddress.getPort
      val (cBad, bBad) = send(port, "POST", "/druid/coordinator/v1/rules/a",
        """[{"type":"loadByTier","tier":"hot"}]""")
      assert(cBad == 400 && bBad.contains("unknown rule type"), bBad)
      val (c, _) = send(port, "POST", "/druid/coordinator/v1/rules/_default",
        """[{"type":"dropBeforeByPeriod","period":"P2D"}]""")
      assert(c == 200)
      assert(graft.sources.druid.SegmentCatalog.metaFor(s"$root/a").size == 2)
      assert(graft.sources.druid.SegmentCatalog.metaFor(s"$root/b").size == 2)
      // full-map GET carries both keys ("a" was rejected, so only _default)
      val (cg, bg) = send(port, "GET", "/druid/coordinator/v1/rules")
      assert(cg == 200 && bg.contains("_default"), bg)
    } finally server.stop(0)
  }

  test("rules survive a broker restart (reloaded from .rules.json)") {
    val root = java.nio.file.Files.createTempDirectory("rules_restart").toString
    writeDays(s"$root/ev", 6)
    val s1 = DruidServe.start(spark,
      n => spark.read.format("druid").load(s"$root/$n"), port = 0,
      sqlTables = Map("ev" -> spark.read.format("druid").load(s"$root/ev")),
      ingestRoot = Some(root))
    val port1 = s1.getAddress.getPort
    val (c, _) = send(port1, "POST", "/druid/coordinator/v1/rules/ev",
      """[{"type":"dropBeforeByPeriod","period":"P4D"},
          {"type":"loadForever"}]""")
    assert(c == 200)
    s1.stop(0)
    val s2 = DruidServe.start(spark,
      n => spark.read.format("druid").load(s"$root/$n"), port = 0,
      ingestRoot = Some(root)) // discovery re-serves ev
    try {
      val (c2, b2) = send(s2.getAddress.getPort, "GET",
        "/druid/coordinator/v1/rules/ev")
      assert(c2 == 200 && b2.contains("P4D"), b2)
    } finally s2.stop(0)
  }

  test("interval drop requires containment; straddlers survive") {
    val root = java.nio.file.Files.createTempDirectory("rules_iv").toString
    import spark.implicits._
    // one segment fully inside the drop interval, one straddling its end
    Seq((java.sql.Timestamp.valueOf("2024-01-05 12:00:00"), 1L))
      .toDF("__time", "v").coalesce(1)
      .write.format("druid").mode("append").save(s"$root/ev")
    Seq((java.sql.Timestamp.valueOf("2024-01-09 23:00:00"), 2L),
        (java.sql.Timestamp.valueOf("2024-01-10 12:00:00"), 3L))
      .toDF("__time", "v").coalesce(1)
      .write.format("druid").mode("append").save(s"$root/ev")
    val server = DruidServe.start(spark,
      n => spark.read.format("druid").load(s"$root/$n"), port = 0,
      sqlTables = Map("ev" -> spark.read.format("druid").load(s"$root/ev")),
      ingestRoot = Some(root))
    try {
      val port = server.getAddress.getPort
      val (c, b) = send(port, "POST", "/druid/coordinator/v1/rules/ev",
        """[{"type":"dropByInterval",
             "interval":"2024-01-01T00:00:00Z/2024-01-10T00:00:00Z"},
            {"type":"loadForever"}]""")
      assert(c == 200, b)
      val left = graft.sources.druid.SegmentCatalog.metaFor(s"$root/ev")
      assert(left.size == 1, s"straddler must survive: $left")
      assert(left.head.endMs > java.time.Instant
        .parse("2024-01-10T00:00:00Z").toEpochMilli)
    } finally server.stop(0)
  }
}
