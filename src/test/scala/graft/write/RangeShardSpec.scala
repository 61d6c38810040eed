package graft.write

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.druid.SegmentCatalog

/** `shardBy` write option — Druid's `single_dim` range partitioning,
  * declared to Catalyst via RequiresDistributionAndOrdering instead of
  * hand-shuffling: one sampled range exchange, contiguous dim ranges
  * per task, and therefore tight disjoint envelopes that the existing
  * segment pruning turns into whole-segment skips for dim filters.
  */
class RangeShardSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  private val groups = Seq("alpha", "bravo", "chard", "delta")
  private def rows(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      (1700000000000L + (i % 48) * 3600000L,
        groups((i / 500) % groups.size) + f"${i % 500}%03d", i.toLong)
    }.toDF("__time", "name", "n")
  }

  private lazy val dir: String = {
    val out = Files.createTempDirectory("graft-shard").toString + "/t"
    rows(8000).write.format("druid")
      .option("shardBy", "name").option("shards", "4")
      .mode("overwrite").save(out)
    out
  }

  test("sharded write produces disjoint dim envelopes without manual repartition") {
    val metas = SegmentCatalog.metaFor(dir)
    assert(metas.size == 4, s"expected 4 shards, got ${metas.map(_.dir)}")
    val envs = metas.map(_.strZones("name")).sortBy(_._1)
    // contiguous disjoint ranges: each shard's hi <= next shard's lo
    envs.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"overlapping shard envelopes: $envs")
      case _ =>
    }
    assert(envs.head._1 <= "alpha000" && envs.last._2 >= "delta499")
  }

  test("equality filter on the shard dim plans a single segment") {
    val df = spark.read.format("druid").load(dir)
      .filter(col("name") === "bravo123")
    assert(df.rdd.getNumPartitions == 1,
      s"shard pruning failed: ${df.rdd.getNumPartitions} partitions")
    assert(df.count() == 8000 / groups.size / 500)
    // a value above every envelope plans zero partitions
    val none = spark.read.format("druid").load(dir)
      .filter(col("name") === "zz_nothing")
    assert(none.rdd.getNumPartitions == 0 && none.count() == 0)
  }

  test("range filter on the shard dim skips disjoint shards") {
    val df = spark.read.format("druid").load(dir)
      .filter(col("name") >= "chard" && col("name") < "delta")
    // sample-approximate boundaries: at most one straddle
    assert(df.rdd.getNumPartitions <= 2,
      s"bound pruning failed: ${df.rdd.getNumPartitions} partitions")
    assert(df.count() == 2000)
  }

  test("sharding changes layout only, never results") {
    val flat = Files.createTempDirectory("graft-shard").toString + "/flat"
    rows(8000).write.format("druid").mode("overwrite").save(flat)
    val a = spark.read.format("druid").load(dir)
      .groupBy("name").agg(sum("n").as("s"), count("*").as("c"))
    val b = spark.read.format("druid").load(flat)
      .groupBy("name").agg(sum("n").as("s"), count("*").as("c"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("shardBy composes with segmentGranularity: ranges shard WITHIN each chunk") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-shard").toString + "/g"
    val dayAligned = (0 until 8000).map { i =>
      // 1700006400000 = 2023-11-15T00:00Z: 48 h = exactly 2 day-chunks
      (1700006400000L + (i % 48) * 3600000L,
        groups((i / 500) % groups.size) + f"${i % 500}%03d", i.toLong)
    }.toDF("__time", "name", "n")
    dayAligned.write.format("druid")
      .option("shardBy", "name").option("shards", "2")
      .option("segmentGranularity", "day")
      .mode("overwrite").save(out)
    val metas = SegmentCatalog.metaFor(out)
    // 48 hours of data = 2 day-chunks x 2 shards
    assert(metas.size == 4, s"expected 2 chunks x 2 shards: ${metas.map(_.dir)}")
    val byChunk = metas.groupBy(_.startMs)
    assert(byChunk.size == 2)
    byChunk.values.foreach { chunk =>
      val envs = chunk.map(_.strZones("name")).sortBy(_._1)
      envs.sliding(2).foreach {
        case Seq((_, hi), (lo2, _)) =>
          assert(hi <= lo2, s"overlap within chunk: $envs")
        case _ =>
      }
    }
    // a (time, dim) filter hits exactly one segment
    val one = spark.read.format("druid").load(out)
      .filter(col("__time") ===
          lit(new java.sql.Timestamp(1700006400000L + 30 * 3600000L)) &&
        col("name") === "alpha006")
    assert(one.rdd.getNumPartitions == 1)
  }

  test("shardBy validation is loud") {
    val out = Files.createTempDirectory("graft-shard").toString + "/bad"
    val e1 = intercept[Exception] {
      rows(10).write.format("druid").option("shardBy", "nope")
        .mode("overwrite").save(out)
    }
    assert(e1.getMessage.contains("no such column"))
    val e2 = intercept[Exception] {
      rows(10).write.format("druid").option("shardBy", "__time")
        .mode("overwrite").save(out)
    }
    assert(e2.getMessage.contains("segmentGranularity"))
  }
}
