package graft

import org.apache.spark.sql.SparkSession

/** DEV-ONLY scratch profiler; not part of the library. */
object BenchScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries("dr8_time_bounds")(spark, sfDir)
    try {
      println(s"[scratch] count=${df.count()}")
      println(s"[scratch] inner agg count over agg = " +
        spark.read.format("druid").load("/tmp/graft_segments/_root_testdata_sf0.001_events")
          .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1))).count())
    } catch { case e: Throwable =>
      println(s"[scratch] FAILED: ${e.getMessage}")
      var c = e.getCause
      while (c != null) { println(s"[scratch] cause: ${c.getMessage}"); c = c.getCause }
      e.printStackTrace()
    }
    spark.stop()
  }
}
