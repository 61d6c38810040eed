package graft

import org.apache.spark.sql.SparkSession

/** Dev-only probe for the r4→r5 uniform bench drift: times three cheap
  * relational queries in a fresh session, then replays the full bench
  * session lifecycle (all-query warm-up at sf0.001 + staging at the
  * target SF), then times the same three queries again. A material
  * post-suite inflation implicates accumulated session state; flat
  * timings implicate the driver host environment.
  */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val probes = Seq("q2_filter_agg", "q29_json_extract", "q32_array_hof",
      "q30_bucketed_join")
    def time(tag: String): Unit = probes.foreach { name =>
      val fn = SparkEntry.queries(name)
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $tag $name min=${ts.min}%.3f med=${ts.sorted.apply(2)}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    // fresh-session baseline (after the same generic warm-up Bench does)
    spark.range(1000000).selectExpr("sum(id)", "count(distinct id % 100)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_name").count().collect()
    // stage once so q30's bucketed tables exist for the baseline too
    graft.queries.Relational.stageBucketed(spark, sfDir)
    time("fresh")
    // full bench lifecycle: every query once at sf0.001, then staging
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () }
    }
    try graft.queries.DruidQueries.stage(spark, sfDir) catch { case _: Throwable => () }
    try graft.queries.PipelineQueries.ivfIndexDir(spark, sfDir) catch { case _: Throwable => () }
    try graft.queries.PipelineQueries.pqIndexDir(spark, sfDir) catch { case _: Throwable => () }
    try graft.queries.PipelineQueries.lshBandsDir(spark, sfDir) catch { case _: Throwable => () }
    try graft.queries.PipelineQueries.ivfPqIndexDir(spark, sfDir) catch { case _: Throwable => () }
    spark.catalog.clearCache()
    time("post-suite")
    println(s"PROBE tempViews=${spark.catalog.listTables().count()}")
    spark.stop()
  }
}
