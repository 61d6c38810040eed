package graft.sql

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Druid SQL's TIME_* function family as pure Catalyst expression
  * compositions — `TIME_FLOOR` / `TIME_CEIL` / `TIME_SHIFT` /
  * `TIME_EXTRACT` / `TIME_PARSE` / `TIME_FORMAT` / `TIME_IN_INTERVAL`
  * plus `MILLIS_TO_TIMESTAMP` / `TIMESTAMP_TO_MILLIS`, so Druid SQL
  * time queries run on Spark unchanged (the reference delegates its SQL
  * surface wholesale to its query engine, which has none of these:
  * /root/reference/src/main.rs:188-192).
  *
  * Everything stays inside whole-stage codegen: the ISO-8601 period /
  * interval literals are parsed ONCE at analysis time (they are literals
  * in any real Druid query) and compiled into plain arithmetic over
  * `unix_millis`, calendar expressions (`Year`/`Month`/`MakeDate`), and
  * `from_utc_timestamp`/`to_utc_timestamp` shifts — no UDF anywhere, so
  * a TIME_FLOOR bucket key feeds Spark's hash aggregate exactly like a
  * built-in `date_trunc`.
  *
  * Semantics notes (documented deviations, all UTC-exact):
  *  - Duration periods (PT15M, P1D, P1W, P2DT6H) bucket by fixed millis
  *    from the origin (default epoch), Druid's `PeriodGranularity` with
  *    a fixed-offset zone; month/year periods (P1M, P3M, P1Y) bucket on
  *    calendar month counts. Mixed month+time periods are rejected
  *    loudly.
  *  - The `timezone` argument localizes via from/to_utc_timestamp; DST
  *    transitions inside one bucket follow wall-clock arithmetic (the
  *    fixed-offset interpretation).
  */
object DruidTime {

  /** months XOR fixed millis; mixed periods rejected at parse. */
  private[sql] case class DruidPeriod(months: Int, millis: Long) {
    def isMonthly: Boolean = months > 0
  }

  private val PeriodRe =
    ("""P(?:(\d+)Y)?(?:(\d+)M)?(?:(\d+)W)?(?:(\d+)D)?""" +
      """(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+(?:\.\d+)?)S)?)?""").r

  private[sql] def parsePeriod(s: String): DruidPeriod = s.trim match {
    case PeriodRe(y, mo, w, d, h, mi, sec) =>
      def l(x: String): Long = if (x == null) 0L else x.toLong
      val months = (l(y) * 12 + l(mo)).toInt
      val secMillis =
        if (sec == null) 0L else math.round(sec.toDouble * 1000)
      val millis = l(w) * 7 * 86400000L + l(d) * 86400000L +
        l(h) * 3600000L + l(mi) * 60000L + secMillis
      require(months > 0 || millis > 0, s"empty period '$s'")
      require(months == 0 || millis == 0,
        s"mixed month+time period '$s' is not supported (use one or the other)")
      DruidPeriod(months, millis)
    case other =>
      throw new IllegalArgumentException(s"cannot parse ISO-8601 period '$other'")
  }

  /** Literal-string argument (the period / unit / timezone slots — in
    * Druid SQL these are always literals).
    */
  private def litString(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case l: Literal if l.foldable && l.value != null => l.value.toString
    case other =>
      throw new IllegalArgumentException(
        s"$what must be a string literal, got $other")
  }

  private def asTs(e: Expression): Expression = e.dataType match {
    case TimestampType => e
    case _ => Cast(e, TimestampType)
  }

  /** UTC instant -> wall clock in tz (represented as a UTC-frame ts). */
  private def inZone(ts: Expression, tz: Option[String]): Expression =
    tz.fold(ts)(z => FromUTCTimestamp(ts, Literal(z)))
  private def outZone(ts: Expression, tz: Option[String]): Expression =
    tz.fold(ts)(z => ToUTCTimestamp(ts, Literal(z)))

  /** Calendar months since 1970-01 of a (local-frame) timestamp. */
  private def monthsSinceEpoch(local: Expression): Expression =
    Add(Multiply(Subtract(Year(local), Literal(1970)), Literal(12)),
        Subtract(Month(local), Literal(1)))

  /** First instant of calendar month `fm` (months since 1970-01), as a
    * UTC-frame timestamp. `fm - pmod(fm, 12)` is an exact multiple of
    * 12, so the division is exact for negative months too (floorDiv).
    */
  private def monthStartTs(fm: Expression): Expression = {
    val mm = Pmod(fm, Literal(12))
    val yy = Add(Cast(new IntegralDivide(Subtract(fm, mm), Literal(12)),
                      IntegerType), Literal(1970))
    Cast(MakeDate(yy, Add(mm, Literal(1)), Literal(1)), TimestampType,
      Some("UTC"))
  }

  private def floorLocal(local: Expression, p: DruidPeriod,
                         originLocal: Option[Expression]): Expression =
    if (p.isMonthly) {
      val m = monthsSinceEpoch(local)
      val om = originLocal.map(monthsSinceEpoch).getOrElse(Literal(0))
      monthStartTs(Subtract(m, Pmod(Subtract(m, om), Literal(p.months))))
    } else {
      val millis = UnixMillis(local)
      val o = originLocal.map(UnixMillis).getOrElse(Literal(0L))
      MillisToTimestamp(
        Subtract(millis, Pmod(Subtract(millis, o), Literal(p.millis))))
    }

  /** One period past the local-frame floor (the ceil step). */
  private def bumpLocal(floor: Expression, p: DruidPeriod): Expression =
    if (p.isMonthly)
      monthStartTs(Add(monthsSinceEpoch(floor), Literal(p.months)))
    else MillisToTimestamp(Add(UnixMillis(floor), Literal(p.millis)))

  private def floorArgs(exprs: Seq[Expression], name: String)
      : (Expression, DruidPeriod, Option[Expression], Option[String]) = {
    require(exprs.length >= 2 && exprs.length <= 4,
      s"$name(ts, period[, origin[, timezone]]) takes 2-4 args, got ${exprs.length}")
    val p = parsePeriod(litString(exprs(1), s"$name period"))
    val origin = exprs.lift(2).filter {
      case Literal(null, _) => false
      case _ => true
    }.map(asTs)
    val tz = exprs.lift(3).map(litString(_, s"$name timezone"))
    (asTs(exprs.head), p, origin, tz)
  }

  val timeFloor: Seq[Expression] => Expression = { exprs =>
    val (ts, p, origin, tz) = floorArgs(exprs, "time_floor")
    outZone(floorLocal(inZone(ts, tz), p, origin.map(inZone(_, tz))), tz)
  }

  val timeCeil: Seq[Expression] => Expression = { exprs =>
    val (ts, p, origin, tz) = floorArgs(exprs, "time_ceil")
    val local = inZone(ts, tz)
    val f = floorLocal(local, p, origin.map(inZone(_, tz)))
    outZone(If(EqualTo(f, local), local, bumpLocal(f, p)), tz)
  }

  val timeShift: Seq[Expression] => Expression = { exprs =>
    require(exprs.length >= 3 && exprs.length <= 4,
      s"time_shift(ts, period, step[, timezone]) takes 3-4 args, got ${exprs.length}")
    val p = parsePeriod(litString(exprs(1), "time_shift period"))
    val step = exprs(2)
    val tz = exprs.lift(3).map(litString(_, "time_shift timezone"))
    val ts = asTs(exprs.head)
    if (p.isMonthly) {
      // calendar-aware month add (clamps 31st -> 30th like Druid/Joda);
      // wall-clock months in tz via the localize/delocalize pair
      val local = inZone(ts, tz)
      outZone(TimestampAdd("MONTH",
        Multiply(Cast(step, IntegerType), Literal(p.months)), local), tz)
    } else
      MillisToTimestamp(Add(UnixMillis(ts),
        Multiply(Cast(step, LongType), Literal(p.millis))))
  }

  val timeExtract: Seq[Expression] => Expression = { exprs =>
    require(exprs.length >= 2 && exprs.length <= 3,
      s"time_extract(ts, unit[, timezone]) takes 2-3 args, got ${exprs.length}")
    val tz = exprs.lift(2).map(litString(_, "time_extract timezone"))
    val local = inZone(asTs(exprs.head), tz)
    val unit = litString(exprs(1), "time_extract unit").toUpperCase
    val out: Expression = unit match {
      case "EPOCH"   => UnixSeconds(asTs(exprs.head)) // tz-invariant
      case "MILLISECOND" => Pmod(UnixMillis(asTs(exprs.head)), Literal(1000L))
      case "SECOND"  => Second(local)
      case "MINUTE"  => Minute(local)
      case "HOUR"    => Hour(local)
      case "DAY"     => DayOfMonth(local)
      case "DOW"     => Add(WeekDay(local), Literal(1)) // 1=Mon..7=Sun (ISO)
      case "DOY"     => DayOfYear(local)
      case "WEEK"    => WeekOfYear(local) // ISO week
      case "MONTH"   => Month(local)
      case "QUARTER" => Quarter(local)
      case "YEAR"    => Year(local)
      case other =>
        throw new IllegalArgumentException(s"time_extract unit '$other'")
    }
    Cast(out, LongType)
  }

  val timeParse: Seq[Expression] => Expression = { exprs =>
    require(exprs.nonEmpty && exprs.length <= 3,
      s"time_parse(string[, pattern[, timezone]]) takes 1-3 args, got ${exprs.length}")
    val parsed: Expression = exprs.lift(1).filter {
      case Literal(null, _) => false
      case _ => true
    } match {
      case Some(pat) => new ParseToTimestamp(exprs.head, pat)
      case None      => Cast(exprs.head, TimestampType) // ISO-8601
    }
    // pattern-less ISO strings carry their own offset; a timezone arg
    // re-interprets offset-less wall-clock strings in that zone
    exprs.lift(2).map(litString(_, "time_parse timezone"))
      .fold(parsed)(z => ToUTCTimestamp(parsed, Literal(z)))
  }

  /** Druid's default output: ISO-8601 millis in UTC with literal Z. */
  private val IsoOut = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"

  val timeFormat: Seq[Expression] => Expression = { exprs =>
    require(exprs.nonEmpty && exprs.length <= 3,
      s"time_format(ts[, pattern[, timezone]]) takes 1-3 args, got ${exprs.length}")
    val tz = exprs.lift(2).map(litString(_, "time_format timezone"))
    val pat = exprs.lift(1).filter {
      case Literal(null, _) => false
      case _ => true
    }.getOrElse(Literal(IsoOut))
    DateFormatClass(inZone(asTs(exprs.head), tz), pat)
  }

  /** `TIME_IN_INTERVAL(ts, '2024-01-01/2024-01-08')` — also accepts a
    * period on either side ('2024-01-01/P1W', 'P1W/2024-01-08');
    * half-open [start, end) like Druid intervals.
    */
  val timeInInterval: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2,
      s"time_in_interval(ts, interval) takes 2 args, got ${exprs.length}")
    val (s, e) = parseIsoInterval(litString(exprs(1), "interval"))
    val millis = UnixMillis(asTs(exprs.head))
    And(GreaterThanOrEqual(millis, Literal(s)), LessThan(millis, Literal(e)))
  }

  private[sql] def parseIsoInterval(iv: String): (Long, Long) = {
    import java.time._
    def instantMillis(s: String): Long = {
      val t = s.trim
      try Instant.parse(t).toEpochMilli
      catch { case _: Exception =>
        try LocalDateTime.parse(t).toInstant(ZoneOffset.UTC).toEpochMilli
        catch { case _: Exception =>
          LocalDate.parse(t).atStartOfDay(ZoneOffset.UTC).toInstant.toEpochMilli
        }
      }
    }
    def plusPeriod(ms: Long, p: String, sign: Int): Long = {
      val dp = parsePeriod(p)
      if (dp.isMonthly)
        Instant.ofEpochMilli(ms).atZone(ZoneOffset.UTC)
          .plusMonths(sign * dp.months.toLong).toInstant.toEpochMilli
      else ms + sign * dp.millis
    }
    val parts = iv.split("/", 2)
    require(parts.length == 2, s"interval '$iv' must be 'start/end'")
    val (a, b) = (parts(0).trim, parts(1).trim)
    val se =
      if (a.startsWith("P")) {
        val e = instantMillis(b); (plusPeriod(e, a, -1), e)
      } else if (b.startsWith("P")) {
        val s = instantMillis(a); (s, plusPeriod(s, b, +1))
      } else (instantMillis(a), instantMillis(b))
    require(se._1 <= se._2, s"interval '$iv' is reversed")
    se
  }

  val millisToTimestamp: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, "millis_to_timestamp takes 1 arg")
    MillisToTimestamp(Cast(exprs.head, LongType))
  }

  val timestampToMillis: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, "timestamp_to_millis takes 1 arg")
    UnixMillis(asTs(exprs.head))
  }

  /** (name, usage, builder) rows for registration. */
  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("time_floor",
      "time_floor(ts, period[, origin[, timezone]]) - Druid TIME_FLOOR",
      timeFloor),
    ("time_ceil",
      "time_ceil(ts, period[, origin[, timezone]]) - Druid TIME_CEIL",
      timeCeil),
    ("time_shift",
      "time_shift(ts, period, step[, timezone]) - Druid TIME_SHIFT",
      timeShift),
    ("time_extract",
      "time_extract(ts, unit[, timezone]) - Druid TIME_EXTRACT",
      timeExtract),
    ("time_parse",
      "time_parse(string[, pattern[, timezone]]) - Druid TIME_PARSE",
      timeParse),
    ("time_format",
      "time_format(ts[, pattern[, timezone]]) - Druid TIME_FORMAT",
      timeFormat),
    ("time_in_interval",
      "time_in_interval(ts, 'start/end') - Druid TIME_IN_INTERVAL",
      timeInInterval),
    ("millis_to_timestamp",
      "millis_to_timestamp(millis) - Druid MILLIS_TO_TIMESTAMP",
      millisToTimestamp),
    ("timestamp_to_millis",
      "timestamp_to_millis(ts) - Druid TIMESTAMP_TO_MILLIS",
      timestampToMillis))
}
