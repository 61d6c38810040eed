package graft

import org.apache.spark.sql.SparkSession

/** DEV-ONLY scratch profiler; not part of the library. */
object BenchScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val names = if (args.nonEmpty) args.toSeq else Seq("d2_dedup_minhash_lsh")
    for (n <- names; rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[scratch] $n%-28s rep$rep ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$rows")
    }
    spark.stop()
  }
}
