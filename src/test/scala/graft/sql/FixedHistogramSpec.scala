package graft.sql

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class FixedHistogramSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("bucket counts are exact and oob mass is tracked") {
    val s = FixedHistogram.empty(10, 0.0, 100.0)
    Seq(-5.0, 0.0, 9.999, 10.0, 55.0, 99.999, 100.0, 250.0)
      .foreach(FixedHistogram.add(s, _))
    assert(FixedHistogram.lowerOob(s) == 1)   // -5
    assert(FixedHistogram.upperOob(s) == 2)   // 100, 250 (hi is exclusive)
    assert(FixedHistogram.count(s, 0) == 2)   // 0, 9.999
    assert(FixedHistogram.count(s, 1) == 1)   // 10.0
    assert(FixedHistogram.count(s, 5) == 1)   // 55
    assert(FixedHistogram.count(s, 9) == 1)   // 99.999
  }

  test("merge is bin-wise exact and order-independent (blob equality)") {
    val whole = FixedHistogram.empty(20, 0.0, 1000.0)
    val a = FixedHistogram.empty(20, 0.0, 1000.0)
    val b = FixedHistogram.empty(20, 0.0, 1000.0)
    (0 until 10000).foreach { i =>
      val v = (i * 37 % 1100).toDouble - 50
      FixedHistogram.add(whole, v)
      if (i % 3 == 0) FixedHistogram.add(a, v) else FixedHistogram.add(b, v)
    }
    assert(FixedHistogram.merge(a, b).toSeq == whole.toSeq)
    assert(FixedHistogram.merge(b, a).toSeq == whole.toSeq)
  }

  test("merge rejects config mismatches") {
    val a = FixedHistogram.empty(10, 0.0, 100.0)
    val b = FixedHistogram.empty(10, 0.0, 200.0)
    intercept[IllegalArgumentException](FixedHistogram.merge(a, b))
  }

  test("quantile interpolation error is bounded by one bucket width") {
    val n = 100
    val s = FixedHistogram.empty(n, 0.0, 1.0)
    val vals = (0 until 10000).map(i => (Hll.hash(i) >>> 11).toDouble /
      (1L << 53).toDouble) // deterministic uniform [0,1)
    vals.foreach(FixedHistogram.add(s, _))
    val sorted = vals.sorted
    for (phi <- Seq(0.1, 0.25, 0.5, 0.9, 0.99)) {
      val exact = sorted(((phi * sorted.size).toInt - 1).max(0))
      val est = FixedHistogram.quantile(s, phi)
      assert(math.abs(est - exact) <= 1.0 / n + 1e-9,
        s"phi=$phi est=$est exact=$exact")
    }
  }

  test("point mass gives exact quantiles") {
    val s = FixedHistogram.empty(10, 0.0, 100.0)
    (0 until 1000).foreach(_ => FixedHistogram.add(s, 42.0))
    val q = FixedHistogram.quantile(s, 0.5)
    assert(q >= 40.0 && q < 50.0, s"point mass q50=$q") // inside its bucket
  }

  test("aggregator is partition-invariant: same blob from any layout") {
    import spark.implicits._
    val df = (0 until 5000).map(i => ((i * 13 % 600).toDouble - 20))
      .toDF("v")
    def blob(parts: Int): Seq[Byte] =
      df.repartition(parts)
        .agg(HistFunctions.histBuild(col("v"), 25, 0.0, 500.0))
        .head().getAs[Array[Byte]](0).toSeq
    assert(blob(1) == blob(7))
    assert(blob(1) == blob(32))
  }
}
