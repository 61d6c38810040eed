package graft.sql

import org.scalatest.funsuite.AnyFunSuite

/** Druid SQL `UNNEST` → Spark `LATERAL VIEW explode` rewrite: both
  * wire forms (CROSS JOIN UNNEST / comma UNNEST), MV_TO_ARRAY in the
  * argument, quoted identifiers, chained unnests, literal safety, and
  * the inner-unnest null/empty semantics.
  */
class UnnestSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = graft.SparkTestSession.spark
    graft.sql.DruidSqlCompat.register(s)
    s
  }

  private def setup(): Unit = {
    import spark.implicits._
    Seq(
      (1L, Seq("a", "b"), "x"),
      (2L, Seq("b"), "y"),
      (3L, Seq.empty[String], "z"),
      (4L, null.asInstanceOf[Seq[String]], "w"))
      .toDF("id", "tags", "grp").createOrReplaceTempView("unnest_t")
  }

  test("CROSS JOIN UNNEST groups per element; null/empty rows drop") {
    setup()
    val sql = """SELECT d, count(*) AS n FROM unnest_t
                 CROSS JOIN UNNEST(MV_TO_ARRAY(tags)) AS u (d)
                 GROUP BY 1 ORDER BY 1"""
    val rows = spark.sql(Unnest.rewrite(sql)).collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 1L), ("b", 2L)))
  }

  test("comma-join UNNEST and chained unnests") {
    setup()
    val sql = """SELECT id, d FROM unnest_t, UNNEST(tags) AS u (d)
                 WHERE id <= 2 ORDER BY id, d"""
    val rows = spark.sql(Unnest.rewrite(sql)).collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (1L, "b"), (2L, "b")))
    val chained = """SELECT d, e FROM unnest_t
                     CROSS JOIN UNNEST(tags) AS u (d)
                     CROSS JOIN UNNEST(ARRAY[d, 'k']) AS v (e)
                     WHERE id = 2 ORDER BY e"""
    // ARRAY[..] is Druid syntax; Spark spells it array(..) — use the
    // Spark spelling inside the argument (the rewrite passes the
    // expression through verbatim)
    val rows2 = spark.sql(Unnest.rewrite(chained.replace(
      "ARRAY[d, 'k']", "array(d, 'k')"))).collect()
    assert(rows2.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("b", "b"), ("b", "k")))
  }

  test("UNNEST inside a string literal is untouched; unmodeled shapes pass through") {
    val lit = "SELECT 'CROSS JOIN UNNEST(x) AS u (d)' AS doc"
    assert(Unnest.rewrite(lit) == lit)
    assert(spark.sql(Unnest.rewrite(lit)).collect().head.getString(0) ==
      "CROSS JOIN UNNEST(x) AS u (d)")
    // no alias — not the modeled grammar: left verbatim for the parser
    val bad = "SELECT * FROM t CROSS JOIN UNNEST(tags)"
    assert(Unnest.rewrite(bad) == bad)
    // commented-out UNNEST stays text
    val lineC = "SELECT 1 -- CROSS JOIN UNNEST(x) AS u (d)\nFROM t"
    assert(Unnest.rewrite(lineC) == lineC)
    val blockC = "SELECT /* , UNNEST(x) AS u (d) */ 1"
    assert(Unnest.rewrite(blockC) == blockC)
    val noUnnest = "SELECT 1"
    assert(Unnest.rewrite(noUnnest) eq noUnnest)
  }

  test("the broker SQL endpoint accepts the console's UNNEST shape") {
    setup()
    val server = graft.cli.DruidServe.start(spark,
      _ => spark.table("unnest_t"), port = 0,
      sqlTables = Map("unnest_t" -> spark.table("unnest_t")))
    try {
      val port = server.getAddress.getPort
      val client = java.net.http.HttpClient.newHttpClient()
      val req = java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:$port/druid/v2/sql"))
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
          """{"query": "SELECT d, count(*) AS n FROM unnest_t CROSS JOIN UNNEST(MV_TO_ARRAY(\"tags\")) AS u (d) GROUP BY 1 ORDER BY 1"}"""))
        .build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 200, resp.body())
      val arr = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(resp.body())
      assert(arr.size() == 2)
      assert(arr.get(0).path("d").asText() == "a" &&
        arr.get(0).path("n").asLong() == 1L)
      assert(arr.get(1).path("d").asText() == "b" &&
        arr.get(1).path("n").asLong() == 2L)
    } finally server.stop(0)
  }
}
