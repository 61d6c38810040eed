package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  * Plain `spark.read.parquet` so Catalyst's parquet source handles
  * predicate pushdown / column pruning / partition planning — at 100 TB
  * these become many-file scans and the same code path holds.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark only reads as a
    * raw long (spark.sql.legacy.parquet.nanosAsLong=true, set in
    * Verify/Bench). Normalize to TimestampType (micros) here so queries
    * see one schema either way.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer FLOOR division: ns epoch values exceed 2^53 (so no
        // double math), and `div` truncates toward zero for pre-epoch
        // values (so subtract the sign correction)
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr(
              "ts div 1000 - (CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END)")))
      case _ => df
    }
  }
}
