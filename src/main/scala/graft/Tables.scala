package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  * Plain `spark.read.parquet` so Catalyst's parquet source handles
  * predicate pushdown / column pruning / partition planning — at 100 TB
  * these become many-file scans and the same code path holds.
  */
object Tables {
  import org.apache.spark.sql.functions.col
  import org.apache.spark.sql.types.TimestampNTZType

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Timestamp columns in the driver's parquet have shifted physical
    * annotation between rounds (nanos → tz-less micros). Parquet
    * `timestamp[us]` WITHOUT timezone reads as TIMESTAMP_NTZ, which
    * `unix_micros` / `withWatermark` reject at analysis. Session TZ is
    * pinned UTC everywhere (Verify/Bench/specs), so casting NTZ →
    * TimestampType is value-preserving; queries see one schema
    * regardless of the file's annotation.
    */
  private def normalizeNtz(df: DataFrame): DataFrame =
    df.schema.fields.filter(_.dataType == TimestampNTZType) match {
      case Array() => df
      case ntz => df.withColumns(
        ntz.map(f => f.name -> col(f.name).cast("timestamp")).toMap)
    }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeNtz(spark.read.parquet(s"$dir/$name.parquet"))

  /** `events.ts` was once parquet TIMESTAMP(NANOS), which Spark only
    * reads as a raw long (spark.sql.legacy.parquet.nanosAsLong=true, set
    * in Verify/Bench). Normalize that too, so queries see TimestampType
    * whichever shape the driver generated.
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
