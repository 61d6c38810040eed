package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming READ of a segment table: micro-batches are the segments
  * that appeared since the last offset, with batch-scan pruning and
  * split behavior, exactly-once across checkpointed restarts.
  */
class DruidStreamSourceSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  private def writeBatch(dir: String, from: Int, until: Int, mode: String): Unit = {
    import spark.implicits._
    (from until until).map(i => (1700000000000L + i, i.toLong))
      .toDF("__time", "n").coalesce(1)
      .write.format("druid").mode(mode).save(dir)
  }

  /** Drain available segments into a parquet sink (the memory sink
    * cannot recover from a checkpoint, which is the point here).
    */
  private def drain(dir: String, checkpoint: String, outDir: String): Unit = {
    val q = spark.readStream.format("druid").load(dir)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
  }

  test("tail delivers each appended segment exactly once across restarts") {
    val dir = Files.createTempDirectory("graft-tail").toString + "/t"
    val checkpoint = Files.createTempDirectory("graft-tail-ckp").toString
    val out = Files.createTempDirectory("graft-tail-out").toString + "/o"
    writeBatch(dir, 0, 100, "overwrite")
    writeBatch(dir, 100, 250, "append")

    drain(dir, checkpoint, out)
    assert(spark.read.parquet(out).count() == 250)

    // two more segments land; a NEW stream over the SAME checkpoint
    // must deliver only the delta
    writeBatch(dir, 250, 300, "append")
    writeBatch(dir, 300, 420, "append")
    drain(dir, checkpoint, out)
    val all = spark.read.parquet(out)
    assert(all.count() == 420, s"duplicate or lost delivery: ${all.count()}")
    assert(all.select(countDistinct(col("n"))).head().getLong(0) == 420)

    // nothing new: an empty run adds nothing
    drain(dir, checkpoint, out)
    assert(spark.read.parquet(out).count() == 420)
  }

  test("pushed filters prune tailed batches") {
    val dir = Files.createTempDirectory("graft-tailf").toString + "/t"
    val checkpoint = Files.createTempDirectory("graft-tailf-ckp").toString
    writeBatch(dir, 0, 100, "overwrite")
    writeBatch(dir, 100, 200, "append")
    val q = spark.readStream.format("druid").load(dir)
      .filter(col("n") >= 150)
      .groupBy(lit(1).as("g")).agg(count(lit(1)).as("c"), sum(col("n")).as("s"))
      .writeStream.format("memory").queryName("tailfil")
      .outputMode("complete")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val r = spark.table("tailfil").head()
    assert(r.getLong(1) == 50 && r.getLong(2) == (150L until 200).sum)
  }
}
