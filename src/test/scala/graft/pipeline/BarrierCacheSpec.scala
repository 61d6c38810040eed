package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Bounded barrier-cache registry: the load-bearing materialization
  * caches (m5/m6/d2/d13, LSH buckets) must stay warm for their own
  * gate but never accumulate without bound in a long-lived session.
  */
class BarrierCacheSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def df(tag: Int) = {
    import spark.implicits._
    (0 until 10).map(i => (tag.toLong, i.toLong)).toDF("t", "v")
      .filter(col("v") >= 0) // distinct canonical plan per tag (literal)
  }

  test("registration beyond the bound evicts the oldest barrier") {
    BarrierCache.releaseAll()
    val bound = BarrierCache.bound
    val first = BarrierCache.barrier(df(1000))
    first.count() // populate
    assert(first.storageLevel.useMemory, "barrier must be cached")
    (1 to bound).foreach { i => BarrierCache.barrier(df(1000 + i)).count() }
    assert(BarrierCache.liveCount == bound,
      s"registry must stay at bound, got ${BarrierCache.liveCount}")
    assert(first.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "oldest barrier must be unpersisted once the bound is passed")
    BarrierCache.releaseAll()
    assert(BarrierCache.liveCount == 0)
  }

  test("re-registering the same plan refreshes, never duplicates or self-evicts") {
    BarrierCache.releaseAll()
    val a1 = BarrierCache.barrier(df(2000))
    a1.count()
    // a second pass re-invokes the gate: same canonical plan, new df
    val a2 = BarrierCache.barrier(df(2000))
    assert(BarrierCache.liveCount == 1,
      "same plan must refresh its entry, not append a duplicate")
    // filling the registry to the bound must NOT unpersist the
    // refreshed entry (the stale-duplicate eviction hazard)
    (1 until BarrierCache.bound).foreach { i =>
      BarrierCache.barrier(df(2000 + i)).count()
    }
    assert(a2.storageLevel.useMemory,
      "the refreshed barrier must still be cached at the bound")
    BarrierCache.releaseAll()
  }

  test("gates run correctly under a tiny bound (caches are perf, never correctness)") {
    val prev = scala.sys.props.get("graft.barrier.cache.bound")
    scala.sys.props("graft.barrier.cache.bound") = "1"
    try {
      import spark.implicits._
      val docs = (0L until 40L).map(i =>
          (i, s"src${i % 3}", ("frame" + (i % 5).toString) * 40))
        .toDF("doc_id", "source", "text")
      // m6 registers the frame table AND (via phashNearDup) the band
      // table — bound 1 forces the frame barrier out mid-gate; the
      // result must still be correct, just slower
      val strict = Multimodal.videoNearDup(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      scala.sys.props -= "graft.barrier.cache.bound"
      BarrierCache.releaseAll()
      val loose = Multimodal.videoNearDup(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(strict == loose)
      assert(loose.nonEmpty, "fixture should produce near-dup videos")
    } finally {
      prev match {
        case Some(v) => scala.sys.props("graft.barrier.cache.bound") = v
        case None => scala.sys.props -= "graft.barrier.cache.bound"
      }
      BarrierCache.releaseAll()
    }
  }
}
