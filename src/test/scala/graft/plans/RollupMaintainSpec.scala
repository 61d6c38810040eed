package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** registerMaintained: the staleness tripwire's "stop routing" upgraded
  * to "keep the win" — on base change the next routed-shape query
  * refreshes the engine-owned materialization (incremental merge for
  * append-only deltas, full rebuild on removal/replacement) and routes
  * to the refreshed version, never to a stale one and never silently
  * back to the raw table. Every direction is plan-asserted AND
  * value-checked against the raw aggregation.
  */
class RollupMaintainSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Fresh druid base table + rollup root in temp dirs. */
  private def stage(tag: String): (String, String, DataFrame) = {
    val dir = java.nio.file.Files.createTempDirectory(s"rm-$tag").toString + "/t"
    val rroot = java.nio.file.Files.createTempDirectory(s"rm-$tag-ru").toString
    graft.Tables.events(spark, sf)
      .select(col("ts").as("__time"), col("event_type"), col("value"))
      .write.format("druid").option("segmentGranularity", "day")
      .mode("overwrite").save(dir)
    val druidBase = spark.read.format("druid").load(dir)
      .select(col("__time").as("ts"), col("event_type"), col("value"))
    (dir, rroot, druidBase)
  }

  private def registerM(druidBase: DataFrame, rroot: String): Unit =
    RollupRouting.registerMaintained(spark, druidBase, rroot,
      timeCol = "ts", granularity = "DAY", dims = Seq("event_type"),
      sums = Map("value" -> "value_sum"),
      mins = Map("value" -> "value_min"),
      maxs = Map("value" -> "value_max"),
      countCol = Some("cnt"),
      counts = Map("value" -> "value_cnt"))

  // sum(double) survives to the user-rule batch (count(*) alone would be
  // answered zero-decode by the scan's metadata-aggregate pushdown)
  private def q(druidBase: DataFrame): DataFrame = druidBase
    .groupBy(date_trunc("MONTH", col("ts")).as("m"), col("event_type"))
    .agg(sum(col("value")).as("sv"), count(lit(1)).as("n"),
         min(col("value")).as("mn"), max(col("value")).as("mx"),
         avg(col("value")).as("av"))

  private def asMap(df: DataFrame) = df.collect()
    .map(r => (r.getTimestamp(0), r.getString(1)) ->
      (r.getDouble(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
        r.getDouble(6))).toMap

  private def assertSame(
      got: Map[(java.sql.Timestamp, String), (Double, Long, Double, Double, Double)],
      want: Map[(java.sql.Timestamp, String), (Double, Long, Double, Double, Double)])
      : Unit = {
    assert(got.keySet == want.keySet)
    got.foreach { case (k, (sv, n, mn, mx, av)) =>
      val (sv2, n2, mn2, mx2, av2) = want(k)
      assert(math.abs(sv - sv2) < 1e-6 && n == n2 &&
        mn == mn2 && mx == mx2 && math.abs(av - av2) < 1e-9,
        s"$k: ($sv,$n,$mn,$mx,$av) vs ($sv2,$n2,$mn2,$mx2,$av2)")
    }
  }

  /** The raw answer, computed with routing disarmed for this plan. */
  private def rawAnswer(druidBase: DataFrame) = {
    RollupRouting.clear()
    asMap(q(druidBase))
  }

  test("initial build routes to v000001 and matches the raw answer") {
    val (_, rroot, druidBase) = stage("init")
    val want = rawAnswer(druidBase)
    registerM(druidBase, rroot)
    try {
      val routed = q(druidBase)
      assert(planOf(routed).contains(s"$rroot/v000001"),
        s"did not route to the built rollup:\n${planOf(routed)}")
      assertSame(asMap(routed), want)
    } finally RollupRouting.clear()
  }

  test("append ingest auto-refreshes incrementally and keeps routing") {
    val (dir, rroot, druidBase) = stage("append")
    registerM(druidBase, rroot)
    try {
      assert(planOf(q(druidBase)).contains(s"$rroot/v000001"))
      val inc0 = RollupRouting.incrementalRefreshes.get()
      val full0 = RollupRouting.fullRebuilds.get()
      // ingest into the base (exactly what the statements API does)
      graft.Tables.events(spark, sf).limit(50)
        .select(col("ts").as("__time"), col("event_type"), col("value"))
        .write.format("druid").mode("append").save(dir)
      val after = q(druidBase)
      val p = planOf(after)
      assert(p.contains(s"$rroot/v000002"),
        s"did not route to the REFRESHED rollup:\n$p")
      assert(!p.contains("v000001"), s"still reads the stale version:\n$p")
      assert(RollupRouting.incrementalRefreshes.get() == inc0 + 1 &&
        RollupRouting.fullRebuilds.get() == full0,
        "append delta must take the incremental merge, not a full rebuild")
      val got = asMap(after)
      assertSame(got, rawAnswer(druidBase))
    } finally RollupRouting.clear()
  }

  test("segment removal triggers a full rebuild, still value-exact") {
    val (dir, rroot, druidBase) = stage("drop")
    registerM(druidBase, rroot)
    try {
      assert(planOf(q(druidBase)).contains(s"$rroot/v000001"))
      val full0 = RollupRouting.fullRebuilds.get()
      // retention drop: remove everything before the median timestamp
      val cut = graft.Tables.events(spark, sf)
        .selectExpr("percentile_approx(unix_millis(ts), 0.5)")
        .collect().head.getLong(0)
      val st = graft.write.Retention.dropContained(dir, Long.MinValue, cut)
      assert(st.segmentsDropped > 0, "precondition: the drop removed segments")
      val after = q(druidBase)
      assert(planOf(after).contains(s"$rroot/v000002"),
        s"did not refresh after removal:\n${planOf(after)}")
      assert(RollupRouting.fullRebuilds.get() == full0 + 1,
        "removal must take the full rebuild")
      assertSame(asMap(after), rawAnswer(druidBase))
    } finally RollupRouting.clear()
  }

  test("restart adoption: re-register reuses the newest version, no new build") {
    val (_, rroot, druidBase) = stage("adopt")
    registerM(druidBase, rroot)
    def versions = Option(new java.io.File(rroot).listFiles())
      .getOrElse(Array.empty).count(_.getName.matches("v\\d{6}"))
    try {
      assert(versions == 1)
      RollupRouting.clear() // "process restart"
      registerM(druidBase, rroot)
      assert(versions == 1, "re-register must adopt, not rebuild")
      assert(planOf(q(druidBase)).contains(s"$rroot/v000001"))
    } finally RollupRouting.clear()
  }

  test("non-rename/cast base projection is rejected at call time") {
    val (_, rroot, druidBase) = stage("reject")
    val bad = druidBase.select(col("ts"), col("event_type"),
      (col("value") * 2).as("value"))
    val e = intercept[IllegalArgumentException] {
      registerM(bad, rroot)
    }
    assert(e.getMessage.contains("renames/casts"))
    RollupRouting.clear()
  }
}
