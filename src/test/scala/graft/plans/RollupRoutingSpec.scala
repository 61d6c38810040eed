package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The rollup-routing rule must (a) actually swap the relation — the
  * oracle gate alone cannot see that, since an un-routed query answers
  * identically — and (b) NEVER fire on a shape it cannot answer
  * exactly. Both directions are plan-asserted here.
  */
class RollupRoutingSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val base = graft.Tables.events(spark, sf)
  private lazy val rollupPath =
    graft.queries.Relational.stageRollup(spark, sf)

  private def register(): Unit =
    RollupRouting.register(spark, base,
      spark.read.parquet(rollupPath),
      timeCol = "ts", granularity = "DAY", dims = Seq("event_type"),
      sums = Map("value" -> "value_sum"),
      mins = Map("value" -> "value_min"),
      maxs = Map("value" -> "value_max"),
      countCol = Some("cnt"))

  private def planOf(df: DataFrame): String =
    // executedPlan's FileScan carries the location path; the logical
    // string only shows column lists
    df.queryExecution.executedPlan.toString

  test("monthly aggregate routes to the rollup and matches the base") {
    def query = base
      .groupBy(date_trunc("MONTH", col("ts")).as("m"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"),
           min(col("value")).as("mn"), max(col("value")).as("mx"))
    register()
    try {
      val routed = query
      assert(planOf(routed).contains("events_daily"),
        s"did not route:\n${planOf(routed)}")
      assert(!planOf(routed).contains("events.parquet"),
        s"still scans the base:\n${planOf(routed)}")
      val got = routed.collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
        .toMap
      RollupRouting.clear()
      val unrouted = query
      assert(planOf(unrouted).contains("events.parquet"))
      val want = unrouted.collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
        .toMap
      assert(got.keySet == want.keySet)
      got.foreach { case (k, (n, sv, mn, mx)) =>
        val (n2, sv2, mn2, mx2) = want(k)
        assert(n == n2 && mn == mn2 && mx == mx2, s"group $k")
        // sum-of-partial-sums vs direct double sum: ulp-level only
        assert(math.abs(sv - sv2) < 1e-6 * math.max(1.0, math.abs(sv2)),
          s"group $k: $sv vs $sv2")
      }
      assert(got.nonEmpty)
    } finally RollupRouting.clear()
  }

  test("dim filters commute and route; non-exact shapes never do") {
    register()
    try {
      // dim-only filter routes (and the filter lands on the rollup)
      val q2 = base.filter(col("event_type") === "click")
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      assert(planOf(q2).contains("events_daily"), planOf(q2))
      val routedN = q2.collect().head.getLong(1)
      RollupRouting.clear()
      val baseN = base.filter(col("event_type") === "click").count()
      assert(routedN == baseN)
      register()
      // every non-exact shape stays on the base table
      val nonRoutable = Seq(
        // finer granularity than the rollup buckets
        base.groupBy(date_trunc("HOUR", col("ts"))).agg(count(lit(1))),
        // unregistered aggregate
        base.groupBy(col("event_type")).agg(avg(col("value"))),
        // distinct aggregate
        base.groupBy(col("event_type")).agg(countDistinct(col("user_id"))),
        // filter on a MEASURE does not commute with pre-aggregation
        base.filter(col("value") > 10)
          .groupBy(col("event_type")).agg(count(lit(1))),
        // filter on raw time (not a dim) — rollup lost sub-day detail
        base.filter(col("ts") > lit("2024-01-01 06:00:00"))
          .groupBy(col("event_type")).agg(count(lit(1))),
        // grouping by an unregistered column
        base.groupBy(col("user_id")).agg(count(lit(1))),
        // GLOBAL aggregate (empty-base count semantics differ)
        base.agg(count(lit(1))))
      nonRoutable.foreach { q =>
        val p = planOf(q)
        assert(!p.contains("events_daily"), s"over-routed:\n$p")
      }
    } finally RollupRouting.clear()
  }

  test("two routed aggregates coexist in one plan (fresh rollup ids)") {
    def qa = base.filter(col("event_type") === "click")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    def qb = base.filter(col("event_type") === "view")
      .groupBy(col("event_type")).agg(sum(col("value")).as("n"))
    register()
    try {
      val u = qa.union(qb)
      val p = planOf(u)
      assert(p.contains("events_daily"), p)
      assert(!p.contains("events.parquet"), p)
      def vals(rows: Array[org.apache.spark.sql.Row]): Map[String, Double] =
        rows.map(r => r.getString(0) -> (r.get(1) match {
          case l: java.lang.Long => l.toDouble
          case d: java.lang.Double => d.doubleValue()
        })).toMap
      val got = vals(u.collect())
      RollupRouting.clear()
      val want = vals(qa.union(qb).collect())
      assert(got.keySet == want.keySet, s"$got != $want")
      // sum-of-partial-sums vs direct double sum: ulp-level only
      got.foreach { case (k, v) =>
        assert(math.abs(v - want(k)) < 1e-9 * math.max(1.0, math.abs(want(k))),
          s"$k: $v vs ${want(k)}")
      }
    } finally RollupRouting.clear()
  }

  test("SQL-text queries over a view of the base route identically") {
    register()
    try {
      base.createOrReplaceTempView("rr_events")
      val q = spark.sql(
        """SELECT date_trunc('YEAR', ts) AS y, event_type, count(*) AS n,
          |       min(value) AS mn
          |FROM rr_events GROUP BY 1, 2""".stripMargin)
      assert(planOf(q).contains("events_daily"), planOf(q))
      assert(q.collect().nonEmpty)
    } finally {
      RollupRouting.clear()
      val _ = spark.catalog.dropTempView("rr_events")
    }
  }
}
