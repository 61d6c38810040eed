package graft.query

import java.time.{Instant, ZoneId, ZonedDateTime}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential pin for origin-anchored period granularities: the
  * compiler's bucketing (wall-frame shift-truncate for sub-month
  * units, month-index lattice for calendar units, instant arithmetic
  * for precise sub-day fields) is compared against an INDEPENDENT
  * java.time reference that evaluates the defining property directly —
  * bucket(t) = the largest lattice point origin + k·period ≤ t, with
  * period addition in the zone's local calendar (plusDays/plusWeeks/
  * plusMonths preserve local time-of-day across DST, exactly Joda's
  * imprecise-field add that Druid's PeriodGranularity delegates to)
  * and instant addition for the precise sub-day fields. Random
  * timestamps deliberately straddle the US DST transitions.
  */
class OriginGranSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  /** Largest lattice point origin + k·step ≤ t (binary search over a
    * monotone k → Instant map).
    */
  private def latticeFloor(t: Instant, plusK: Long => Instant): Instant = {
    var lo = -2000000L
    var hi = 2000000L
    require(!plusK(lo).isAfter(t) && plusK(hi).isAfter(t), "search range")
    while (hi - lo > 1) {
      val mid = Math.floorDiv(lo + hi, 2)
      if (!plusK(mid).isAfter(t)) lo = mid else hi = mid
    }
    plusK(lo)
  }

  /** The reference bucketing (see class doc). */
  private def refBucket(t: Instant, origin: Instant, zone: ZoneId,
                        period: String): Instant = {
    def zo: ZonedDateTime = origin.atZone(zone)
    period match {
      case "PT1S" | "PT1M" | "PT1H" =>
        // precise fields: pure instant arithmetic in any zone
        val ms = Map("PT1S" -> 1000L, "PT1M" -> 60000L,
          "PT1H" -> 3600000L)(period)
        val x = t.toEpochMilli - origin.toEpochMilli
        Instant.ofEpochMilli(Math.floorDiv(x, ms) * ms + origin.toEpochMilli)
      case "P1D" => latticeFloor(t, k => zo.plusDays(k).toInstant)
      case "P1W" => latticeFloor(t, k => zo.plusWeeks(k).toInstant)
      case "P1M" => latticeFloor(t, k => zo.plusMonths(k).toInstant)
      case "P3M" => latticeFloor(t, k => zo.plusMonths(3 * k).toInstant)
      case "P1Y" => latticeFloor(t, k => zo.plusYears(k).toInstant)
    }
  }

  /** Engine buckets for (id, __time) rows under the given granularity,
    * via a groupBy native query keyed by id.
    */
  private def engineBuckets(rows: Seq[(Long, Instant)], period: String,
                            origin: Instant, tz: String): Map[Long, Instant] = {
    import spark.implicits._
    val df = rows.map { case (id, t) =>
      (id, new java.sql.Timestamp(t.toEpochMilli))
    }.toDF("id", "t")
      .select(col("t").as("__time"), col("id"))
    val tzField = if (tz == "UTC") "" else s""", "timeZone": "$tz""""
    val out = NativeQuery.run(s"""{
      "queryType": "groupBy", "dataSource": "t",
      "granularity": {"type": "period", "period": "$period",
                      "origin": "$origin"$tzField},
      "dimensions": ["id"],
      "aggregations": [{"type": "count", "name": "n"}]
    }""", _ => df).collect()
    out.map(r => r.getAs[Long]("id") ->
      Instant.ofEpochMilli(r.getTimestamp(0).getTime)).toMap
  }

  test("origin buckets match the independent lattice reference (incl. DST)") {
    val rnd = new scala.util.Random(1234)
    // timestamps: uniform over 2023-2025 plus points packed around the
    // US 2024 DST transitions (Mar 10, Nov 3)
    val springForward = Instant.parse("2024-03-10T10:00:00Z")
    val fallBack = Instant.parse("2024-11-03T09:00:00Z")
    val base = Instant.parse("2023-01-01T00:00:00Z")
    val ts: Seq[Instant] =
      (1 to 30).map(_ => base.plusSeconds(rnd.nextLong(3L * 365 * 86400))) ++
      (-6 to 6).map(h => springForward.plusSeconds(h * 3600L + 901)) ++
      (-6 to 6).map(h => fallBack.plusSeconds(h * 3600L + 901))
    val configs = Seq(
      ("PT1H", "2024-01-01T00:30:00Z", "America/Los_Angeles"),
      ("PT1H", "2021-06-05T00:17:23Z", "UTC"),
      ("P1D",  "2024-01-01T06:00:00Z", "America/Los_Angeles"),
      ("P1D",  "2024-02-03T04:05:06Z", "Asia/Tokyo"),
      ("P1W",  "2024-01-02T18:00:00Z", "America/Los_Angeles"),
      ("P1W",  "2023-05-17T12:00:00Z", "UTC"),
      ("P1M",  "2024-01-15T06:30:00Z", "UTC"),
      ("P1M",  "2023-03-28T23:00:00Z", "America/Los_Angeles"),
      ("P3M",  "2024-02-15T00:00:00Z", "UTC"),
      ("P3M",  "2022-11-05T08:00:00Z", "Asia/Tokyo"),
      ("P1Y",  "2021-02-28T12:00:00Z", "America/Los_Angeles"),
      ("P1Y",  "2020-07-04T00:00:00Z", "UTC"),
      // month-END origins: Joda clamps the day per boundary
      // (Aug 31 + 1M = Sep 30, + 2M = Oct 31 — no cumulative drift);
      // java.time's plusMonths in the reference clamps identically
      ("P1M",  "2023-08-31T06:00:00Z", "UTC"),
      ("P1M",  "2024-01-31T00:00:00Z", "America/Los_Angeles"),
      ("P3M",  "2023-11-30T12:00:00Z", "UTC"),
      ("P1Y",  "2020-02-29T00:00:00Z", "UTC")) // leap-day origin
    configs.foreach { case (period, originS, tz) =>
      val origin = Instant.parse(originS)
      val zone = ZoneId.of(tz)
      val rows = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = engineBuckets(rows, period, origin, tz)
      rows.foreach { case (id, t) =>
        val want = refBucket(t, origin, zone, period)
        assert(got(id) == want,
          s"$period origin=$originS tz=$tz t=$t: " +
            s"engine=${got(id)} reference=$want")
      }
    }
  }

  test("month-end origin zero-fill spine clamps per boundary, not cumulatively") {
    import spark.implicits._
    // one event, zero-filled P1M spine anchored at Aug 31 06:00Z: the
    // boundaries must be Aug31, Sep30, Oct31, Nov30, Dec31, Jan31 —
    // a cumulative `+1 month` walk would decay to the 30th/28th after
    // the first short month and never recover
    val df = Seq((new java.sql.Timestamp(
        Instant.parse("2023-09-15T00:00:00Z").toEpochMilli), 1L))
      .toDF("__time", "id")
    val out = NativeQuery.run("""{
      "queryType": "timeseries", "dataSource": "t",
      "granularity": {"type": "period", "period": "P1M",
                      "origin": "2023-08-31T06:00:00Z"},
      "intervals": ["2023-09-01T00:00:00Z/2024-02-10T00:00:00Z"],
      "aggregations": [{"type": "count", "name": "n"}]
    }""", _ => df).collect()
      .map(r => Instant.ofEpochMilli(r.getTimestamp(0).getTime)).toSeq.sorted
    val want = Seq("2023-08-31T06:00:00Z", "2023-09-30T06:00:00Z",
      "2023-10-31T06:00:00Z", "2023-11-30T06:00:00Z",
      "2023-12-31T06:00:00Z", "2024-01-31T06:00:00Z")
      .map(Instant.parse)
    assert(out == want, s"spine $out")
  }
}
