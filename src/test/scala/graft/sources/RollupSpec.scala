package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Ingest-time rollup (`rollup=true` + `queryGranularity`): rows
  * sharing (floored __time, all dims) collapse per write task with
  * metrics summed, metadata.drd records the rollup, and re-aggregating
  * reads recover the raw answers exactly.
  */
class RollupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def srcDf = {
    import spark.implicits._
    // 4 hours x 3 dims x many duplicate rows; value has nulls.
    // Base is hour-aligned so the minute steps span exactly 4 UTC hours.
    (0 until 4800).map { i =>
      (new java.sql.Timestamp(1699999200000L + (i % 240) * 60000L), // minute steps over 4h
        s"d${i % 3}",
        if (i % 7 == 0) None else Some(i.toDouble / 8),
        1L)
    }.toDF("__time", "dim", "value", "n_rows")
  }

  test("rollup collapses rows and re-aggregation matches the raw data") {
    val out = Files.createTempDirectory("graft-rollup").toString + "/t"
    srcDf.repartition(3).write.format("druid")
      .option("rollup", "true").option("queryGranularity", "hour")
      .mode("overwrite").save(out)

    val back = spark.read.format("druid").load(out)
    // (4 distinct hours x 3 dims) keys x 3 tasks >= stored rows << 4800 raw
    val stored = back.count()
    assert(stored <= 4L * 3 * 3, s"rollup did not collapse: $stored rows")
    assert(stored >= 4L * 3, s"fewer rows than distinct keys: $stored")

    // exact recovery: sums and counts re-aggregate to the raw answers
    val rolled = back.groupBy(col("__time"), col("dim"))
      .agg(sum(col("n_rows")).as("n"), sum(col("value")).as("sv"))
      .orderBy(col("__time"), col("dim")).collect()
    val raw = srcDf.groupBy(date_trunc("hour", col("__time")).as("__time"),
        col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
      .orderBy(col("__time"), col("dim")).collect()
    assert(rolled.length == raw.length)
    rolled.zip(raw).foreach { case (a, b) =>
      assert(a.getTimestamp(0) == b.getTimestamp(0) && a.getString(1) == b.getString(1))
      assert(a.getLong(2) == b.getLong(2), s"count mismatch at $a vs $b")
      assert(math.abs(a.getDouble(3) - b.getDouble(3)) < 1e-6)
    }

    // metadata.drd records the rollup on every segment
    graft.sources.druid.DruidTableUtil.discoverSegments(out).foreach { seg =>
      val md = graft.format.DruidSegment.open(seg).metadataDrd.get
      assert(md.rollup && md.queryGranularity == "hour")
    }
  }

  test("all-null metric groups stay null; mixed groups ignore nulls") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-rollup-null").toString + "/t"
    Seq(
      (new java.sql.Timestamp(0L), "a", Option.empty[Double]),
      (new java.sql.Timestamp(1L), "a", Option.empty[Double]),
      (new java.sql.Timestamp(2L), "b", Some(1.5)),
      (new java.sql.Timestamp(3L), "b", None))
      .toDF("__time", "dim", "value")
      .coalesce(1).write.format("druid")
      .option("rollup", "true").option("queryGranularity", "hour")
      .mode("overwrite").save(out)
    val back = spark.read.format("druid").load(out)
      .orderBy("dim").collect()
    assert(back.length == 2)
    assert(back(0).getString(1) == "a" && back(0).isNullAt(2))
    assert(back(1).getString(1) == "b" && back(1).getDouble(2) == 1.5)
  }

  test("queryGranularity=none collapses only exact-key duplicates") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-rollup-none").toString + "/t"
    Seq((new java.sql.Timestamp(1000L), "x", 1L),
        (new java.sql.Timestamp(1000L), "x", 2L),
        (new java.sql.Timestamp(2000L), "x", 4L))
      .toDF("__time", "dim", "m")
      .coalesce(1).write.format("druid").option("rollup", "true")
      .mode("overwrite").save(out)
    val back = spark.read.format("druid").load(out)
      .orderBy("__time").collect()
    assert(back.map(_.getLong(2)).toSeq == Seq(3L, 4L))
  }

  test("compaction with rollup options re-collapses across segments") {
    // rollup at ingest is per-task best-effort: 3 tasks each carry all
    // 12 (hour, dim) keys, so the table stores up to 36 rows. Compacting
    // WITH the same rollup options merges segments into one task, whose
    // rollup then collapses across the old segment boundaries — Druid's
    // compaction-with-rollup, via plain option pass-through.
    val out = Files.createTempDirectory("graft-rollup-compact").toString + "/t"
    srcDf.repartition(3).write.format("druid")
      .option("rollup", "true").option("queryGranularity", "hour")
      .mode("overwrite").save(out)
    val partial = spark.read.format("druid").load(out).count()
    assert(partial > 12, s"expected partial rollup > 12 rows, got $partial")

    graft.write.Compaction.compact(spark, out, targetRowsPerSegment = 100000,
      options = Map("rollup" -> "true", "queryGranularity" -> "hour"))
    val full = spark.read.format("druid").load(out)
    assert(full.count() == 12, "compaction did not fully re-collapse")
    assert(full.agg(sum("n_rows")).head.getLong(0) == 4800L)
  }

  test("differential: rollup write + re-aggregation equals direct aggregation (seeded random)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    val out = Files.createTempDirectory("graft-rollup-diff").toString + "/t"
    // random rows: long + double metrics with nulls, second-granular
    // times over 6 hours, and a dim that is sometimes null
    val src = (0 until 3000).map { _ =>
      (new java.sql.Timestamp(1699999200000L + rnd.nextInt(6 * 3600) * 1000L),
        if (rnd.nextInt(10) == 0) null else s"k${rnd.nextInt(5)}",
        if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(1000).toLong),
        if (rnd.nextInt(5) == 0) None else Some(rnd.nextDouble() * 100))
    }.toDF("__time", "dim", "m_long", "m_double")
    src.repartition(5).write.format("druid")
      .option("rollup", "true").option("queryGranularity", "fifteen_minute")
      .mode("overwrite").save(out)
    val back = spark.read.format("druid").load(out)
      .groupBy(col("__time"), col("dim"))
      .agg(sum(col("m_long")).as("sl"), sum(col("m_double")).as("sd"),
           count(lit(1)).as("n_stored"))
      .orderBy(col("__time"), col("dim")).collect()
    val direct = src
      .groupBy((floor(unix_millis(col("__time")) / 900000L) * 900000L).as("b"),
        col("dim"))
      .agg(sum(col("m_long")).as("sl"), sum(col("m_double")).as("sd"))
      .orderBy(col("b"), col("dim")).collect()
    assert(back.length == direct.length, "group-key sets differ")
    back.zip(direct).foreach { case (a, b) =>
      assert(a.getTimestamp(0).getTime == b.getLong(0), s"time: $a vs $b")
      assert(a.getString(1) == b.getString(1), s"dim: $a vs $b")
      assert((a.isNullAt(2) && b.isNullAt(2)) ||
        a.getLong(2) == b.getLong(2), s"m_long: $a vs $b")
      assert((a.isNullAt(3) && b.isNullAt(3)) ||
        math.abs(a.getDouble(3) - b.getDouble(3)) < 1e-9, s"m_double: $a vs $b")
      // partial rollup: stored rows per key bounded by task count
      assert(a.getLong(4) <= 5, s"more copies than tasks: $a")
    }
  }

  test("rollup rejects binary and non-time timestamp columns") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-rollup-rej").toString + "/t"
    val err = intercept[Exception] {
      Seq((new java.sql.Timestamp(0L), new java.sql.Timestamp(1L), 1L))
        .toDF("__time", "seen_at", "m")
        .write.format("druid").option("rollup", "true")
        .mode("overwrite").save(out)
    }
    assert(err.getMessage.contains("rollup"))
  }

  test("rollupDimensions groups numeric id columns instead of summing them") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-rollup-numdim").toString + "/t"
    Seq(
      (new java.sql.Timestamp(0L), 7L, 1L),
      (new java.sql.Timestamp(1L), 7L, 2L),
      (new java.sql.Timestamp(2L), 9L, 4L),
      (new java.sql.Timestamp(3L), 9L, 8L))
      .toDF("__time", "user_id", "m")
      .coalesce(1).write.format("druid")
      .option("rollup", "true").option("queryGranularity", "hour")
      .option("rollupDimensions", "user_id")
      .mode("overwrite").save(out)
    val back = spark.read.format("druid").load(out).orderBy("user_id").collect()
    // user_id grouped (NOT summed to 14/18); m summed per user
    assert(back.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((7L, 3L), (9L, 12L)))
    // unknown dimension name fails fast
    val err = intercept[Exception] {
      Seq((new java.sql.Timestamp(0L), 1L)).toDF("__time", "m")
        .write.format("druid").option("rollup", "true")
        .option("rollupDimensions", "nope").mode("overwrite")
        .save(Files.createTempDirectory("graft-rollup-baddim").toString + "/t")
    }
    assert(err.getMessage.contains("rollupDimensions"))
  }

  test("multi-value dimensions participate in the rollup key") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-rollup-mv").toString + "/t"
    Seq(
      (new java.sql.Timestamp(0L), Seq("a", "b"), 1L),
      (new java.sql.Timestamp(1L), Seq("a", "b"), 2L),
      (new java.sql.Timestamp(2L), Seq("b", "a"), 4L), // order matters (Druid MV equality is positional)
      (new java.sql.Timestamp(3L), null.asInstanceOf[Seq[String]], 8L))
      .toDF("__time", "tags", "m")
      .coalesce(1).write.format("druid")
      .option("rollup", "true").option("queryGranularity", "hour")
      .mode("overwrite").save(out)
    val back = spark.read.format("druid").load(out).orderBy("m").collect()
    assert(back.length == 3)
    assert(back.map(_.getLong(2)).toSeq == Seq(3L, 4L, 8L))
    assert(back(0).getSeq[String](1) == Seq("a", "b"))
    assert(back(1).getSeq[String](1) == Seq("b", "a"))
  }

  test("streaming sink rolls up per epoch") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val srcDir = Files.createTempDirectory("graft-roll-ssrc").toString + "/t"
    val ckpt = Files.createTempDirectory("graft-roll-sckp").toString
    val dst = Files.createTempDirectory("graft-roll-sdst").toString + "/t"
    // 1000 raw rows, 2 dims, one hour — a rolled epoch lands 2 rows
    (0 until 1000).map(i =>
        (new java.sql.Timestamp(1699999200000L + i * 1000L), s"d${i % 2}", 1L))
      .toDF("__time", "dim", "n_rows").coalesce(1)
      .write.format("druid").mode("overwrite").save(srcDir)
    val q = spark.readStream.format("druid").load(srcDir)
      .writeStream.format("druid")
      .option("checkpointLocation", ckpt)
      .option("rollup", "true").option("queryGranularity", "hour")
      .trigger(Trigger.AvailableNow()).start(dst)
    q.awaitTermination(60000)
    val out = spark.read.format("druid").load(dst).orderBy("dim").collect()
    assert(out.length == 2, s"expected 2 rolled rows, got ${out.length}")
    assert(out.map(_.getLong(2)).toSeq == Seq(500L, 500L))
  }

  test("rollup composes with segmentGranularity bucketing") {
    val out = Files.createTempDirectory("graft-rollup-buckets").toString + "/t"
    srcDf.coalesce(1).write.format("druid")
      .option("rollup", "true").option("queryGranularity", "hour")
      .option("segmentGranularity", "hour")
      .mode("overwrite").save(out)
    // one segment per hour, each fully rolled: 3 dims per segment
    val segs = graft.sources.druid.DruidTableUtil.discoverSegments(out)
    assert(segs.size == 4, s"expected 4 hour segments, got ${segs.size}")
    val back = spark.read.format("druid").load(out)
    assert(back.count() == 12)
    assert(back.agg(sum("n_rows")).head.getLong(0) == 4800L)
  }
}
