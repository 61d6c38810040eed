package graft.sql

import java.sql.Timestamp

import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Druid SQL compatibility surface: TIME_* / MV_* / LOOKUP / EARLIEST /
  * LATEST / SAFE_DIVIDE / DataSketches aggregator names, exercised the
  * way a Druid user would — as plain SQL text through `spark.sql`.
  */
class DruidSqlCompatSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def one(sql: String): Any = spark.sql(s"SELECT $sql").head.get(0)
  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("Druid scalar spellings: div, bitwise, strings, parse_long") {
    DruidSqlCompat.register(spark)
    assert(one("DIV(17, 5)") == 3L)
    assert(one("DIV(-17, 5)") == -3L) // integral divide truncates toward zero
    assert(one("BITWISE_AND(12, 10)") == 8L)
    assert(one("BITWISE_OR(12, 10)") == 14L)
    assert(one("BITWISE_XOR(12, 10)") == 6L)
    assert(one("BITWISE_SHIFT_LEFT(3, 2)") == 12L)
    assert(one("BITWISE_SHIFT_RIGHT(12, 2)") == 3L)
    assert(one("CONTAINS_STRING('druid rocks', 'rock')") == true)
    assert(one("CONTAINS_STRING('druid rocks', 'Rock')") == false)
    assert(one("ICONTAINS_STRING('druid rocks', 'Rock')") == true)
    assert(one("STRPOS('abcabc', 'c')") == 3)
    assert(one("STRPOS('abc', 'z')") == 0)
    assert(one("TEXTCAT('foo', 'bar')") == "foobar")
    assert(one("STRING_FORMAT('%s-%03d', 'x', 7)") == "x-007")
    assert(one("PARSE_LONG('42')") == 42L)
    assert(one("PARSE_LONG('nope')") == null)
    assert(one("PARSE_LONG('ff', 16)") == 255L)
    // signed radix parsing follows Long.parseLong, not conv()'s
    // unsigned wraparound; garbage digits null out instead of
    // conv()'s silent 0
    assert(one("PARSE_LONG('-ff', 16)") == -255L)
    assert(one("PARSE_LONG('zz', 16)") == null)
    assert(one("PARSE_LONG('', 16)") == null)
    assert(one("PARSE_LONG('z1', 36)") == 35L * 36 + 1)
    assert(one("PARSE_LONG('-101', 2)") == -5L)
    // IPv4 family
    assert(one("IPV4_PARSE('192.168.0.1')") == 3232235521L)
    assert(one("IPV4_PARSE('256.1.1.1')") == null)
    assert(one("IPV4_PARSE(3232235521)") == 3232235521L)
    assert(one("IPV4_STRINGIFY(3232235521)") == "192.168.0.1")
    assert(one("IPV4_MATCH('10.2.3.4', '10.0.0.0/8')") == true)
    assert(one("IPV4_MATCH('11.2.3.4', '10.0.0.0/8')") == false)
    assert(one("IPV4_MATCH('10.2.3.4', '10.2.3.4/32')") == true)
    // APPROX_QUANTILE: exact in the small-n regime
    assert(spark.sql(
      "SELECT APPROX_QUANTILE(v, 0.5) FROM VALUES (1.0),(2.0),(3.0) t(v)")
      .head.getDouble(0) == 2.0)
    assert(spark.sql(
      "SELECT APPROX_QUANTILE(v, 0.0, 128) FROM VALUES (5.0),(9.0) t(v)")
      .head.getDouble(0) == 5.0)
    // a huge resolution clamps to the accuracy CAP (long arithmetic)
    // instead of overflowing Int onto the floor
    assert(spark.sql(
      "SELECT APPROX_QUANTILE(v, 1.0, 20000000) FROM VALUES (5.0),(9.0) t(v)")
      .head.getDouble(0) == 9.0)
    // IPv4 range gates: out-of-unsigned-32 longs are null, /33 is
    // false, malformed subnets are false (never a masked wrong match)
    assert(spark.sql("SELECT IPV4_STRINGIFY(4294967296)").head.isNullAt(0))
    assert(one("IPV4_MATCH('10.0.0.1', '10.0.0.0/33')") == false)
    assert(one("IPV4_MATCH('10.0.0.1', 'garbage')") == false)
    // all native Catalyst — no UDF in any of these plans
    val plan = spark.sql(
      "SELECT DIV(17,5), BITWISE_AND(1,3), STRPOS('a','a'), PARSE_LONG('1')")
      .queryExecution.analyzed
    assert(plan.expressions.forall(e =>
      e.collect { case u: ScalaUDF => u }.isEmpty))
  }

  test("time_floor: duration periods bucket by fixed millis from origin") {
    assert(one("time_floor(TIMESTAMP '2024-03-15 13:47:21', 'PT15M')") ==
      ts("2024-03-15 13:45:00"))
    assert(one("time_floor(TIMESTAMP '2024-03-15 13:47:21', 'P1D')") ==
      ts("2024-03-15 00:00:00"))
    // P1W with default (epoch) origin: 1970-01-01 was a Thursday
    assert(one("time_floor(TIMESTAMP '2024-03-15 13:47:21', 'P1W')") ==
      ts("2024-03-14 00:00:00"))
    // explicit origin realigns the buckets
    assert(one("time_floor(TIMESTAMP '2024-03-15 13:47:21', 'PT1H'," +
      " TIMESTAMP '2024-01-01 00:30:00')") == ts("2024-03-15 13:30:00"))
  }

  test("time_floor: month periods bucket on calendar months") {
    assert(one("time_floor(TIMESTAMP '2024-03-15 13:47:21', 'P1M')") ==
      ts("2024-03-01 00:00:00"))
    // quarters relative to 1970-01: Jan/Apr/Jul/Oct
    assert(one("time_floor(TIMESTAMP '2024-05-15 13:47:21', 'P3M')") ==
      ts("2024-04-01 00:00:00"))
    assert(one("time_floor(TIMESTAMP '2024-05-15 13:47:21', 'P1Y')") ==
      ts("2024-01-01 00:00:00"))
  }

  test("time_floor: timezone localizes the bucket boundary") {
    // 2024-03-15T03:00 UTC is 2024-03-14 in Los_Angeles (UTC-7 in DST)
    assert(one("time_floor(TIMESTAMP '2024-03-15 03:00:00', 'P1D', NULL," +
      " 'America/Los_Angeles')") == ts("2024-03-14 07:00:00"))
  }

  test("time_ceil: identity on boundary, next bucket otherwise") {
    assert(one("time_ceil(TIMESTAMP '2024-03-15 13:45:00', 'PT15M')") ==
      ts("2024-03-15 13:45:00"))
    assert(one("time_ceil(TIMESTAMP '2024-03-15 13:45:01', 'PT15M')") ==
      ts("2024-03-15 14:00:00"))
    assert(one("time_ceil(TIMESTAMP '2024-03-15 13:45:01', 'P1M')") ==
      ts("2024-04-01 00:00:00"))
  }

  test("time_shift: calendar months clamp day-of-month; durations are exact") {
    assert(one("time_shift(TIMESTAMP '2024-01-31 05:00:00', 'P1M', 1)") ==
      ts("2024-02-29 05:00:00"))
    assert(one("time_shift(TIMESTAMP '2024-01-31 05:00:00', 'P1M', -2)") ==
      ts("2023-11-30 05:00:00"))
    assert(one("time_shift(TIMESTAMP '2024-01-31 05:00:00', 'PT90M', 2)") ==
      ts("2024-01-31 08:00:00"))
  }

  test("time_extract: Druid unit contracts (DOW 1=Mon..7=Sun, ISO WEEK)") {
    // 2024-03-15 was a Friday
    assert(one("time_extract(TIMESTAMP '2024-03-15 13:47:21', 'DOW')") == 5L)
    assert(one("time_extract(TIMESTAMP '2024-03-17 13:47:21', 'DOW')") == 7L)
    assert(one("time_extract(TIMESTAMP '2024-03-15 13:47:21', 'HOUR')") == 13L)
    assert(one("time_extract(TIMESTAMP '2024-01-01 00:00:01', 'EPOCH')") ==
      1704067201L)
    assert(one("time_extract(TIMESTAMP '2024-03-15 13:47:21', 'QUARTER')") == 1L)
  }

  test("time_parse / time_format round-trip; Druid default ISO output") {
    assert(one("time_parse('2024-03-15T13:47:21.500Z')") ==
      ts("2024-03-15 13:47:21.5"))
    assert(one("time_parse('15/03/2024 13:47', 'dd/MM/yyyy HH:mm')") ==
      ts("2024-03-15 13:47:00"))
    assert(one("time_format(TIMESTAMP '2024-03-15 13:47:21.25')") ==
      "2024-03-15T13:47:21.250Z")
    assert(one("time_format(TIMESTAMP '2024-03-15 13:47:21', 'yyyy/MM/dd')") ==
      "2024/03/15")
  }

  test("time_in_interval: half-open, period-relative ends") {
    assert(one("time_in_interval(TIMESTAMP '2024-01-03 00:00:00'," +
      " '2024-01-01/2024-01-08')") == true)
    assert(one("time_in_interval(TIMESTAMP '2024-01-08 00:00:00'," +
      " '2024-01-01/2024-01-08')") == false)
    assert(one("time_in_interval(TIMESTAMP '2024-01-03 00:00:00'," +
      " '2024-01-01/P1W')") == true)
    assert(one("time_in_interval(TIMESTAMP '2023-12-31 23:59:59'," +
      " '2024-01-01/P1W')") == false)
  }

  test("millis round-trips") {
    assert(one("timestamp_to_millis(millis_to_timestamp(1704067201500))") ==
      1704067201500L)
  }

  test("time functions compile to pure Catalyst (no UDF in the plan)") {
    val df = spark.sql(
      "SELECT time_floor(TIMESTAMP '2024-03-15 13:47:21', 'P3M')," +
        " time_extract(TIMESTAMP '2024-03-15 13:47:21', 'DOW')")
    val udfs = df.queryExecution.analyzed.expressions
      .flatMap(_.collect { case u: ScalaUDF => u })
    assert(udfs.isEmpty, s"time family must stay codegen-able: $udfs")
  }

  test("mv family: index contracts, order/dup preservation") {
    assert(one("mv_length(array('a','b','a'))") == 3)
    assert(one("mv_contains(array('a','b'), 'b')") == true)
    assert(one("mv_overlap(array('a','b'), array('x','b'))") == true)
    assert(one("mv_offset(array('a','b','c'), 1)") == "b")
    assert(one("mv_offset(array('a','b','c'), 9)") == null)
    assert(one("mv_ordinal(array('a','b','c'), 1)") == "a")
    assert(one("mv_to_string(array('a','b'), '|')") == "a|b")
    assert(one("string_to_mv('a|b|c', '[|]')") == Seq("a", "b", "c"))
    assert(one("mv_slice(array('a','b','c','d'), 1, 3)") == Seq("b", "c"))
    assert(one("mv_append(array('a'), 'b')") == Seq("a", "b"))
    assert(one("mv_prepend('z', array('a'))") == Seq("z", "a"))
    assert(one("mv_concat(array('a'), array('b'))") == Seq("a", "b"))
    // duplicates preserved (array_intersect would collapse the two 'a's)
    assert(one("mv_filter_only(array('a','b','a','c'), array('a','c'))") ==
      Seq("a", "a", "c"))
    assert(one("mv_filter_none(array('a','b','a','c'), array('a'))") ==
      Seq("b", "c"))
  }

  test("lookup: inline and closure paths, retain/replace semantics") {
    DruidLookups.register("tiny", Map("click" -> "engagement",
      "view" -> "engagement"))
    DruidLookups.register("big",
      (0 until 200).map(i => s"k$i" -> s"v$i").toMap)
    assert(one("lookup('click', 'tiny')") == "engagement")
    assert(one("lookup('purchase', 'tiny')") == null)
    assert(one("lookup('purchase', 'tiny', 'other')") == "other")
    assert(one("lookup('k137', 'big')") == "v137")
    assert(one("lookup('nope', 'big', 'missing')") == "missing")
    intercept[Exception](spark.sql("SELECT lookup('x', 'unregistered')"))
  }

  test("earliest/latest: implicit __time, explicit _by variants") {
    spark.sql(
      """SELECT timestamp_millis(CAST(m AS BIGINT)) AS __time,
        |       CAST(m AS BIGINT) AS v, concat('u', m % 2) AS grp
        |FROM range(10) t(m)""".stripMargin)
      .createOrReplaceTempView("graft_el_t")
    val rows = spark.sql(
      """SELECT grp, earliest(v) AS e, latest(v) AS l,
        |       earliest_by(v, __time) AS eb, latest_by(v, __time) AS lb
        |FROM graft_el_t GROUP BY grp ORDER BY grp""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq(("u0", 0L, 8L, 0L, 8L), ("u1", 1L, 9L, 1L, 9L)))
  }

  test("safe_divide: null on zero/null denominator, no error") {
    assert(one("safe_divide(10, 4)") == 2.5d)
    assert(one("safe_divide(10, 0)") == null)
    assert(one("safe_divide(10, CAST(NULL AS INT))") == null)
  }

  test("sketch aggregator names: exact-regime estimates match exact SQL") {
    spark.sql(
      """SELECT CAST(m % 100 AS BIGINT) AS k, CAST(m AS DOUBLE) AS x
        |FROM range(1000) t(m)""".stripMargin)
      .createOrReplaceTempView("graft_ds_t")
    assert(one("(SELECT approx_count_distinct_ds_hll(k) FROM graft_ds_t)") ==
      100L)
    assert(one("(SELECT approx_count_distinct_ds_theta(k) FROM graft_ds_t)") ==
      100L)
    // theta build agg -> post-agg estimate, sketch column round shape
    assert(one("(SELECT theta_sketch_estimate(ds_theta(k)) FROM graft_ds_t)") ==
      100.0d)
    // set ops against a shifted set: overlap of [0,100) and [50,150) is 50
    spark.sql("SELECT CAST(m % 100 + 50 AS BIGINT) AS k FROM range(1000) t(m)")
      .createOrReplaceTempView("graft_ds_u")
    assert(one(
      """theta_sketch_estimate(theta_sketch_intersect(
        |  (SELECT ds_theta(k) FROM graft_ds_t),
        |  (SELECT ds_theta(k) FROM graft_ds_u)))""".stripMargin) == 50.0d)
    assert(one(
      """theta_sketch_estimate(theta_sketch_union(
        |  (SELECT ds_theta(k) FROM graft_ds_t),
        |  (SELECT ds_theta(k) FROM graft_ds_u)))""".stripMargin) == 150.0d)
    assert(one(
      """theta_sketch_estimate(theta_sketch_not(
        |  (SELECT ds_theta(k) FROM graft_ds_t),
        |  (SELECT ds_theta(k) FROM graft_ds_u)))""".stripMargin) == 50.0d)
    // quantiles in the exact regime: order statistic at rank ceil(q*n).
    // k must keep n=1000 inside the sketch's exact window (base buffer
    // holds 2k values); the default k=128 goes approximate past 256
    // values and its randomized compaction makes the answer run-varying.
    assert(one("(SELECT approx_quantile_ds(x, 0.5, 1024) FROM graft_ds_t)") ==
      499.0d)
    assert(one(
      "(SELECT ds_get_quantile(ds_quantiles_sketch(x, 1024), 0.99) FROM graft_ds_t)") ==
      989.0d)
  }

  test("theta build agg merges pre-built blobs through a BinaryType child") {
    // two per-group sketches -> ds_theta over the sketch column = union
    spark.sql(
      """SELECT ds_theta(k) AS sk FROM (
        |  SELECT CAST(m AS BIGINT) AS k, m % 2 AS g FROM range(100) t(m))
        |GROUP BY g""".stripMargin)
      .createOrReplaceTempView("graft_ds_blobs")
    assert(one(
      "(SELECT theta_sketch_estimate(ds_theta(sk)) FROM graft_ds_blobs)") ==
      100.0d)
  }
}
