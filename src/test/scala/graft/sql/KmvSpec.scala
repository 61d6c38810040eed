package graft.sql

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class KmvSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("retained set is the k smallest distinct hashes") {
    val s = Kmv.empty(8)
    val xs = (0 until 1000).map(_.toLong)
    xs.foreach(Kmv.add(s, _))
    xs.reverse.foreach(Kmv.add(s, _)) // duplicates, reverse order
    val expected = xs.map(Kmv.hash).distinct.sorted.take(8)
    assert(Kmv.hashes(s).toSeq == expected)
    assert(Kmv.count(s) == 8)
  }

  test("merge equals a single build over the union (blob equality)") {
    val whole = Kmv.empty(32)
    val a = Kmv.empty(32)
    val b = Kmv.empty(32)
    (0 until 5000).foreach { i =>
      val v = (i * 131).toLong
      Kmv.add(whole, v)
      if (i % 2 == 0) Kmv.add(a, v) else Kmv.add(b, v)
    }
    assert(Kmv.merge(a, b).toSeq == whole.toSeq)
    assert(Kmv.merge(b, a).toSeq == whole.toSeq)
  }

  test("estimate is exact below k and within 15% at 10k distinct") {
    val small = Kmv.empty(64)
    (0 until 40).foreach(i => Kmv.add(small, i * 7L))
    assert(Kmv.estimate(small) == 40)

    val s = Kmv.empty(256)
    (0 until 10000).foreach(i => Kmv.add(s, i * 2654435761L))
    val est = Kmv.estimate(s)
    assert(math.abs(est - 10000) < 1500, s"estimate $est")
  }

  test("intersection estimate tracks true overlap") {
    val a = Kmv.empty(256)
    val b = Kmv.empty(256)
    (0 until 4000).foreach(i => Kmv.add(a, i.toLong))        // [0, 4000)
    (2000 until 6000).foreach(i => Kmv.add(b, i.toLong))     // [2000, 6000)
    val est = Kmv.intersectEstimate(a, b)                    // true: 2000
    assert(est > 1000 && est < 3000, s"intersection estimate $est")
  }

  test("aggregator is partition-invariant: same blob from any layout") {
    import spark.implicits._
    val df = (0 until 3000).map(i => (i * 17L)).toDF("v")
    def blob(parts: Int): Seq[Byte] =
      df.repartition(parts)
        .agg(KmvFunctions.kmvBuild(col("v"), 64))
        .head().getAs[Array[Byte]](0).toSeq
    assert(blob(1) == blob(5))
    assert(blob(1) == blob(32))
  }
}
