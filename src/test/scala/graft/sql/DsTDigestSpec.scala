package graft.sql

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** t-digest family (tdigest_agg + readers + the tDigestSketch native
  * wire): SPEC-gated because t-digest has no exact regime — quantiles
  * interpolate between centroid means and centroid layout depends on
  * merge order. What IS pinned exactly: total weight and min/max; what
  * is pinned with the documented tolerance: quantile rank error.
  */
class DsTDigestSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = graft.SparkTestSession.spark
    DruidSqlCompat.register(s)
    s
  }

  private val n = 10000

  test("total weight is exact; min/max quantiles are the true extremes") {
    import spark.implicits._
    val out = (1 to n).map(_.toDouble).toDF("v").repartition(8)
      .agg(expr("tdigest_agg(v, 100)").as("sk"))
      .select(expr("tdigest_total_weight(sk)").as("w"),
        expr("tdigest_sketch_quantile(sk, 0.0)").as("lo"),
        expr("tdigest_sketch_quantile(sk, 1.0)").as("hi"))
      .head()
    assert(out.getLong(0) == n.toLong)
    assert(out.getDouble(1) == 1.0)
    assert(out.getDouble(2) == n.toDouble)
  }

  test("median rank error within the t-digest bound") {
    import spark.implicits._
    val out = (1 to n).map(_.toDouble).toDF("v").repartition(8)
      .agg(expr("tdigest_agg(v, 100)").as("sk"))
      .select(expr("tdigest_sketch_quantile(sk, 0.5)").as("med"),
        expr("tdigest_rank(sk, 5000.0)").as("r"))
      .head()
    // t-digest rank error is tightest at the extremes and loosest at
    // the median; 1% of n is conservative for compression 100
    assert(math.abs(out.getDouble(0) - n / 2.0) <= n * 0.01,
      s"median ${out.getDouble(0)}")
    assert(math.abs(out.getDouble(1) - 0.5) <= 0.01, s"rank ${out.getDouble(1)}")
  }

  test("distributed merge preserves weight and stays within tolerance") {
    import spark.implicits._
    def run(parts: Int) =
      (1 to n).map(_.toDouble).toDF("v").repartition(parts)
        .agg(expr("tdigest_agg(v, 100)").as("sk"))
        .select(expr("tdigest_total_weight(sk)").as("w"),
          expr("tdigest_sketch_quantile(sk, 0.9)").as("p90"))
        .head()
    val (a, b) = (run(1), run(16))
    assert(a.getLong(0) == b.getLong(0))
    // merge-order dependence is real; both estimates must sit near the
    // true p90, not near each other bit-for-bit. Merged digests carry
    // roughly double the single-pass error — 2% of n bounds it.
    assert(math.abs(a.getDouble(1) - 9000.0) <= n * 0.02)
    assert(math.abs(b.getDouble(1) - 9000.0) <= n * 0.02)
  }

  test("binary children merge pre-built blobs") {
    import spark.implicits._
    val merged = (1 to n).map(i => (s"g${i % 4}", i.toDouble)).toDF("g", "v")
      .groupBy("g").agg(expr("tdigest_agg(v, 100)").as("sk"))
      .agg(expr("tdigest_agg(sk, 100)").as("sk2"))
      .select(expr("tdigest_total_weight(sk2)").as("w"),
        expr("tdigest_sketch_quantile(sk2, 0.5)").as("med"))
      .head()
    assert(merged.getLong(0) == n.toLong)
    // two merge levels compound the centroid-drift error at the median
    assert(math.abs(merged.getDouble(1) - n / 2.0) <= n * 0.03)
  }

  test("blobs are real DataSketches wire format (library round-trip)") {
    import spark.implicits._
    val blob = (1 to 100).map(_.toDouble).toDF("v")
      .agg(expr("tdigest_agg(v, 200)").as("sk"))
      .head().getAs[Array[Byte]](0)
    val sk = org.apache.datasketches.tdigest.TDigestDouble.heapify(
      org.apache.datasketches.memory.Memory.wrap(blob))
    assert(sk.getTotalWeight == 100L)
    assert(sk.getMinValue == 1.0 && sk.getMaxValue == 100.0)
  }

  test("Druid SQL wire names: TDIGEST_QUANTILE aggregates, TDIGEST_GENERATE_SKETCH builds") {
    import spark.implicits._
    val df = (1 to n).map(_.toDouble).toDF("v").repartition(8)
    df.createOrReplaceTempView("td_sql")
    // Druid SQL spelling, case-insensitive: aggregate + quantile in one
    val med = spark.sql(
      "SELECT TDIGEST_QUANTILE(v, 0.5, 100) FROM td_sql").head().getDouble(0)
    assert(math.abs(med - n / 2.0) <= n * 0.01, s"median $med")
    val w = spark.sql(
      "SELECT tdigest_total_weight(TDIGEST_GENERATE_SKETCH(v, 100)) FROM td_sql")
      .head().getLong(0)
    assert(w == n.toLong)
  }

  test("native wire: tDigestSketch aggregator + quantile post-aggs") {
    import spark.implicits._
    val events = (1 to 1000).map(i =>
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "e", i.toDouble))
      .toDF("__time", "event_type", "value")
    val out = graft.query.NativeQuery.run("""{
      "queryType": "groupBy", "dataSource": "ev", "granularity": "all",
      "dimensions": ["event_type"],
      "aggregations": [
        {"type": "tDigestSketch", "name": "td", "fieldName": "value",
         "compression": 100}],
      "postAggregations": [
        {"type": "quantileFromTDigestSketch", "name": "p50",
         "field": {"type": "fieldAccess", "fieldName": "td"}, "fraction": 0.5},
        {"type": "quantilesFromTDigestSketch", "name": "ps",
         "field": {"type": "fieldAccess", "fieldName": "td"},
         "fractions": [0.1, 0.9]}]
    }""", _ => events).head()
    val p50 = out.getAs[Double]("p50")
    val ps = out.getSeq[Double](out.fieldIndex("ps"))
    assert(math.abs(p50 - 500.0) <= 20.0, s"p50 $p50")
    assert(math.abs(ps(0) - 100.0) <= 20.0 && math.abs(ps(1) - 900.0) <= 20.0,
      s"ps $ps")
    // the raw aggregator column stays a mergeable blob (no finalizer)
    assert(out.getAs[Array[Byte]]("td").nonEmpty)
  }
}
